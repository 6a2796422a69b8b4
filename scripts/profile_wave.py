"""Per-phase wave profiling: runs the bench crawl corpus at a given
core count with PYCRAWLER_TRACE on and console progress bars off, so
every trace line survives. Usage:

    taskset -c 0-{N-1} python scripts/profile_wave.py N
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["PYCRAWLER_TRACE"] = "1"

import bench  # noqa: E402
from pycrawler_spark.config import CrawlConfig  # noqa: E402
from pycrawler_spark.plans.crawl import CrawlEngine  # noqa: E402
from pycrawler_spark.session import get_spark  # noqa: E402


def _cpu_sampler(cores: int, stop, out: list) -> None:
    """Per-second busy%% of cpus 0..cores-1 from /proc/stat."""
    import threading  # noqa: F401

    def snap():
        vals = {}
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu") and line[3].isdigit():
                    p = line.split()
                    n = int(p[0][3:])
                    if n < cores:
                        idle = int(p[4]) + int(p[5])
                        total = sum(int(x) for x in p[1:9])
                        vals[n] = (idle, total)
        return vals

    prev = snap()
    while not stop.wait(1.0):
        cur = snap()
        busy = []
        for n in cur:
            didle = cur[n][0] - prev[n][0]
            dtot = cur[n][1] - prev[n][1]
            busy.append(100 * (1 - didle / max(dtot, 1)))
        prev = cur
        out.append(sum(busy) / len(busy))
        print(f"[cpu] {out[-1]:.0f}% busy ({cores} pinned)", flush=True)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import threading

    if os.environ.get("PYCRAWLER_CPUSAMPLE", "") == "1":
        stop = threading.Event()
        samples: list = []
        threading.Thread(
            target=_cpu_sampler, args=(cores, stop, samples), daemon=True
        ).start()
    cdir = bench.corpus_dir()
    spark = get_spark(
        app_name=f"profile-crawl-{cores}",
        master=f"local[{cores}]",
        # fixed across core counts — same job, same task structure
        # (mirrors bench.py's SPARK_GRAFT_BENCH_PARTITIONS default)
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_BENCH_PARTITIONS", "32")
        ),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    work = tempfile.mkdtemp(prefix=f"profile_crawl_{cores}_")
    cfg = CrawlConfig(depth=bench.CRAWL_DEPTH, max_urls=bench.MAX_URLS)
    eng = CrawlEngine(spark, os.path.join(work, "job"), cfg, job="profile")
    eng.init_job(
        spark.read.parquet(os.path.join(cdir, "seeds.parquet")),
        os.path.join(cdir, "pages.parquet"),
    )
    t0 = time.monotonic()
    stats = eng.run()
    print(f"TOTAL {time.monotonic() - t0:.2f}s cores={cores}")
    for s in stats:
        print(s)
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
