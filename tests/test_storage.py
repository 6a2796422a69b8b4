"""Iceberg storage-path tests.

The round-trip test needs the iceberg-spark-runtime jar on the
classpath; the sandbox container has none (and no network to fetch
one), so it skips there and runs on any environment launched with
``--packages`` + :func:`pycrawler_spark.storage.iceberg_conf`. The
availability probe and conf/spec plumbing are testable everywhere.
"""

from __future__ import annotations

import pytest

from pycrawler_spark import storage


def test_iceberg_conf_shape():
    conf = storage.iceberg_conf(catalog="c1", warehouse="/tmp/wh")
    assert conf["spark.sql.catalog.c1"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.c1.warehouse"] == "/tmp/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_partition_specs_cover_engine_tables():
    # every table the engine commits has an explicit spec decision
    # (empty string = deliberately unpartitioned), so a new engine
    # table without a scale decision fails here first
    engine_tables = {
        "fetches", "frontier", "seen", "tasks", "metrics", "requests",
        "lineage",
    }
    assert engine_tables <= set(storage.PARTITION_SPECS)
    # host-carrying tables must hash-partition by host (north rule)
    for t in ("fetches", "frontier", "requests"):
        assert "host" in storage.PARTITION_SPECS[t]


def test_available_probe_is_false_without_jar(spark):
    # this container ships no Iceberg runtime; the probe must say so
    # (and not raise) — on a cluster with the jar this flips to True
    assert storage.iceberg_available(spark) is False


def test_sync_requires_runtime(spark, tmp_path):
    """sync_to_iceberg on a real engine: clear error without the jar,
    full round-trip (append-per-wave + MERGE tasks) with it."""
    from pycrawler_spark import CrawlConfig
    from pycrawler_spark.plans.crawl import CrawlEngine
    from pycrawler_spark.sources.corpus import write_corpus

    pages, seeds, _ = write_corpus(
        str(tmp_path / "c"), seed=7, n_hosts=3, pages_per_host=6
    )
    eng = CrawlEngine(spark, str(tmp_path / "job"), CrawlConfig(depth=1, max_urls=10))
    eng.init_job(spark.read.parquet(seeds), pages)
    eng.run()

    if not storage.iceberg_available(spark):
        with pytest.raises(RuntimeError, match="Iceberg runtime"):
            storage.sync_to_iceberg(eng)
        pytest.skip("iceberg-spark-runtime jar not on classpath")

    out = storage.sync_to_iceberg(eng, catalog="crawl", db="t1")
    assert out.get("fetches", 0) > 0
    ice = spark.table("crawl.t1.fetches")
    assert ice.count() == eng.table("fetches").count()
    # idempotence: second sync appends nothing
    out2 = storage.sync_to_iceberg(eng, catalog="crawl", db="t1")
    assert out2.get("fetches", 0) == 0
