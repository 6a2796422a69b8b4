"""Benchmark harness (driver contract).

Measures:
1. crawl-engine frontier throughput (URLs scheduled+extracted/sec) on
   a deterministic synthetic wide-fan-out corpus, at TWO parallelism
   levels — local[N_SMALL] and local[N_BIG] — as the sandbox stand-in
   for the north rule's N vs 4N executor scaling criterion;
2. the headline analytic queries from __spark_entry__ at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {...per-query sec + crawl metrics...}, "sf": ...}
and refreshes BENCH.md with the scaling table.
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
SMALL = max(2, CPUS // 4)

# bench corpus: wide fan-out so waves are big (branching=40 ->
# depth-2 wave is ~n_hosts*1600 URLs)
CORPUS = dict(seed=42, n_hosts=12, pages_per_host=1700, mega_factor=3,
              branching=40)
CRAWL_DEPTH = 2
MAX_URLS = 100_000

HEADLINE = [
    "q1_lineitem_agg", "q3_revenue_by_nation", "q6_budget_cumsum",
    "q11_minhash_signatures", "q12_minhash_dup_pairs", "q14_simhash16",
    "q15_embedding_topk", "q16_langid", "q18_token_counts",
    "q20_url_normalize",
]


def corpus_dir() -> str:
    tag = "-".join(str(v) for v in CORPUS.values())
    d = f"/tmp/pycrawler_bench_corpus_{tag}"
    if not os.path.isdir(d):
        from pycrawler_spark.sources.corpus import write_corpus

        write_corpus(d, **CORPUS)
    return d


def run_crawl(cores: int) -> dict:
    import shutil
    import tempfile

    from pycrawler_spark.config import CrawlConfig
    from pycrawler_spark.plans.crawl import CrawlEngine
    from pycrawler_spark.session import get_spark

    cdir = corpus_dir()
    spark = get_spark(
        app_name=f"bench-crawl-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores * 2),
    )
    work = tempfile.mkdtemp(prefix=f"bench_crawl_{cores}_")
    cfg = CrawlConfig(depth=CRAWL_DEPTH, max_urls=MAX_URLS)
    eng = CrawlEngine(spark, os.path.join(work, "job"), cfg, job="bench")
    eng.init_job(
        spark.read.parquet(os.path.join(cdir, "seeds.parquet")),
        os.path.join(cdir, "pages.parquet"),
    )
    t0 = time.monotonic()
    stats = eng.run()
    wall = time.monotonic() - t0
    sched = sum(s["scheduled"] for s in stats)
    found = sum(s["found"] for s in stats)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return {
        "cores": cores,
        "wall_sec": round(wall, 2),
        "scheduled": sched,
        "extracted": found,
        "urls_per_sec": round((sched + found) / wall, 1),
    }


def run_queries() -> dict:
    import __spark_entry__ as entrymod
    from pycrawler_spark.session import get_spark

    spark = get_spark(
        app_name="bench-queries",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(16, CPUS),
    )
    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        n = qs[name](spark, SF_DIR).count()
        out[name] = round(time.monotonic() - t0, 3)
        out[f"{name}_rows"] = n
    spark.stop()
    return out


def main():
    do_scaling = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") != "1"
    results = {}
    scaling = {}
    if do_scaling:
        small = run_crawl(SMALL)
        big = run_crawl(CPUS)
        eff = (big["urls_per_sec"] / small["urls_per_sec"]) / (CPUS / SMALL)
        scaling = {
            f"crawl_urls_per_sec_local{SMALL}": small["urls_per_sec"],
            f"crawl_urls_per_sec_local{CPUS}": big["urls_per_sec"],
            "crawl_scaling_efficiency": round(eff, 3),
            f"crawl_wall_sec_local{CPUS}": big["wall_sec"],
            "crawl_scheduled": big["scheduled"],
            "crawl_extracted": big["extracted"],
        }
        write_bench_md(small, big, eff)

    t0 = time.monotonic()
    qtimes = run_queries()
    qtotal = round(time.monotonic() - t0, 2)
    results = {
        "metric": "headline query suite wall time (crawl throughput + "
        "scaling in queries dict)",
        "value": qtotal,
        "unit": "sec",
        "queries": {**{k: v for k, v in qtimes.items() if not k.endswith("_rows")},
                    **scaling},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
    }
    print(json.dumps(results))


def write_bench_md(small: dict, big: dict, eff: float) -> None:
    md = f"""# BENCH — crawl-engine scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 from N to
4N executors. Sandbox stand-in (single machine, no cluster): the SAME
crawl job on the SAME corpus at local[{small['cores']}] vs
local[{big['cores']}] (cores = executor-thread stand-in).

Corpus: {CORPUS['n_hosts']} hosts x ~{CORPUS['pages_per_host']} pages
(mega-host x{CORPUS['mega_factor']}), branching {CORPUS['branching']},
crawl depth {CRAWL_DEPTH}, budget {MAX_URLS} URLs/site.

| parallelism | wall (s) | URLs scheduled | URLs extracted | URLs/sec |
|---|---|---|---|---|
| local[{small['cores']}] | {small['wall_sec']} | {small['scheduled']} | {small['extracted']} | {small['urls_per_sec']} |
| local[{big['cores']}] | {big['wall_sec']} | {big['scheduled']} | {big['extracted']} | {big['urls_per_sec']} |

**Scaling efficiency ({small['cores']} -> {big['cores']} cores,
x{big['cores']//small['cores']}): {eff:.3f}**

Measured by `python bench.py` (env: SPARK_GRAFT_CPUS={CPUS}).
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
