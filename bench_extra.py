"""Extra benchmarks for the optimization round (bench.py is frozen —
this file carries the guide-§1 instrumentation: per-query isolation
with the noop sink, .explain("formatted") capture, and job/stage
counts per query).

Usage:
  python bench_extra.py plans <tag> [query ...]   # write plans/r06/<q>_<tag>.txt
  python bench_extra.py time [query ...]          # cold + warm medians (count + noop)
  python bench_extra.py jobs <query>              # job/stage count for one query
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WARM_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_WARM_RUNS", "3"))

HEADLINE = [
    "q1_lineitem_agg", "q3_revenue_by_nation", "q6_budget_cumsum",
    "q11_minhash_signatures", "q12_minhash_dup_pairs", "q14_simhash16",
    "q15_embedding_topk", "q16_langid", "q18_token_counts",
    "q20_url_normalize", "q46_boilerplate", "q47_bm25",
    "q52_asof_join", "q53_range_join", "q54_pagerank",
    "q55_unigram_logprob", "q57_winnow_fingerprint",
    "q58_fingerprint_dup_pairs",
]


def _spark():
    from pycrawler_spark.session import get_spark

    return get_spark(
        app_name="bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(16, CPUS),
    )


def _qs():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def _median(xs):
    xs = sorted(xs)
    m = len(xs) // 2
    return xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2


def cmd_plans(tag: str, names):
    spark = _spark()
    qs = _qs()
    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


def cmd_time(names):
    spark = _spark()
    qs = _qs()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench-extra:{name}")
        t0 = time.monotonic()
        qs[name](spark, SF_DIR).count()
        out[name] = round(time.monotonic() - t0, 3)
        warm, warm_noop = [], []
        for _ in range(WARM_RUNS):
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).count()
            warm.append(time.monotonic() - t0)
        for _ in range(WARM_RUNS):
            t0 = time.monotonic()
            (qs[name](spark, SF_DIR)
             .write.format("noop").mode("overwrite").save())
            warm_noop.append(time.monotonic() - t0)
        out[f"{name}_warm"] = round(_median(warm), 3)
        out[f"{name}_warm_noop"] = round(_median(warm_noop), 3)
        print(f"{name}: cold {out[name]} warm {out[name + '_warm']} "
              f"noop {out[name + '_warm_noop']}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


def cmd_jobs(name: str):
    spark = _spark()
    qs = _qs()
    sc = spark.sparkContext
    # warm once so codegen/broadcast spin-up doesn't inflate the count
    qs[name](spark, SF_DIR).count()
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    sc.setJobGroup("probe", name)
    t0 = time.monotonic()
    qs[name](spark, SF_DIR).count()
    wall = time.monotonic() - t0
    jobs = set(tracker.getJobIdsForGroup("probe") or [])
    n_stages = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info:
            n_stages += len(info.stageIds)
    print(json.dumps({"query": name, "jobs": len(jobs - before),
                      "stages": n_stages, "wall": round(wall, 3)}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    if cmd == "plans":
        tag, names = rest[0], rest[1:] or HEADLINE
        cmd_plans(tag, names)
    elif cmd == "jobs":
        cmd_jobs(rest[0])
    else:
        cmd_time(rest or HEADLINE)
