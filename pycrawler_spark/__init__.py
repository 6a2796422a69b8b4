"""pycrawler_spark — a PySpark-native web-crawl analytics engine.

A from-scratch rebuild of the query/dataflow capabilities of the
``metodi022/pycrawler`` reference (a Playwright + Postgres crawling
framework) as an idiomatic Spark engine:

* the URL frontier is a set of columnar tables (parquet / Iceberg when
  available) instead of mutable ORM rows,
* the serial per-site crawl loop becomes bulk-synchronous *fetch waves*
  (one micro-batch per BFS depth level),
* per-page extraction modules become vectorized pandas/Arrow UDFs over
  an ``html: binary`` column,
* the in-memory URL-seen set becomes a host-partitioned exact-dedup
  table fronted by a Bloom-filter prefilter,
* politeness / robots scheduling is a per-host priority queue run via
  ``groupBy(host).applyInPandas``.

Reference semantics are cited as ``file:line`` into ``/root/reference``
throughout; no code is copied from the reference.
"""

from pycrawler_spark.config import CrawlConfig

__all__ = ["CrawlConfig"]
__version__ = "0.1.0"
