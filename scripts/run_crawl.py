"""spark-submit entry point (north rule: ``spark-submit --py-files``).

Usage:
    python -m pycrawler_spark.session  # builds /tmp/pycrawler_spark_pkg.zip
    spark-submit --master <master> \
        --py-files /tmp/pycrawler_spark_pkg.zip \
        scripts/run_crawl.py --seeds SEEDS.parquet --pages PAGES.parquet \
        --workdir /data/job1 [--depth 2] [--max-urls 100] [--politeness] \
        [--robots ROBOTS.parquet] [--resume]

On a cluster the session is created by spark-submit; this script only
configures the job and drives the wave loop.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--job", default="job1")
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--max-urls", type=int, default=100)
    ap.add_argument("--repetitions", type=int, default=1)
    ap.add_argument("--politeness", action="store_true")
    ap.add_argument("--obey-robots", action="store_true")
    ap.add_argument("--robots", default=None)
    ap.add_argument("--derive-robots", action="store_true",
                    help="derive the robots table from the corpus's own "
                         "/robots.txt pages (sources.robots)")
    ap.add_argument("--collect-requests", action="store_true")
    ap.add_argument("--login-seed-injection", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--iceberg-sync", metavar="CATALOG.DB",
                    help="after the crawl, publish committed waves into "
                         "Iceberg tables (snapshot per wave, MERGE tasks); "
                         "requires iceberg-spark-runtime on the classpath "
                         "and the catalog conf from storage.iceberg_conf")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from pycrawler_spark.config import CrawlConfig
    from pycrawler_spark.plans.crawl import CrawlEngine

    spark = SparkSession.builder.appName(f"pycrawler-{args.job}").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    cfg = CrawlConfig(
        depth=args.depth,
        max_urls=args.max_urls,
        repetitions=args.repetitions,
        politeness=args.politeness,
        obey_robots=args.obey_robots,
        collect_requests=args.collect_requests,
        login_seed_injection=args.login_seed_injection,
    )
    eng = CrawlEngine(spark, args.workdir, cfg, job=args.job)
    robots = spark.read.parquet(args.robots) if args.robots else None
    if robots is None and args.derive_robots:
        from pycrawler_spark.sources.robots import derive_robots

        robots = derive_robots(spark.read.parquet(args.pages))
    if args.resume:
        eng.resume()
        eng.robots = robots
    else:
        eng.init_job(
            spark.read.parquet(args.seeds), args.pages, robots=robots
        )
    stats = eng.run()
    if args.iceberg_sync:
        from pycrawler_spark import storage

        catalog, db = args.iceberg_sync.split(".", 1)
        print(json.dumps(
            {"iceberg_sync": storage.sync_to_iceberg(eng, catalog, db)}
        ))
    for s in stats:
        print(json.dumps(s))
    total = sum(s["scheduled"] + s["found"] for s in stats)
    wall = sum(s["wall_sec"] for s in stats)
    print(json.dumps({
        "total_urls": total, "waves": len(stats),
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(total / max(wall, 1e-9), 1),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
