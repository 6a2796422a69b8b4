"""Robots table derived from the corpus itself (north-rule addition;
the reference never implemented robots — TODO at
/root/reference/config-example.py:57).

A real crawl archive stores each host's ``/robots.txt`` fetch like any
other page, so the per-host rules table the politeness scheduler needs
(operators/scheduler.py, streaming/stateful.py) is derivable from the
``pages`` corpus alone — no side-channel input. Entirely JVM-side
(regexp filter + extract + decode): the scan prunes to the ``url``
column first and touches ``html`` only for the ~one-row-per-host
matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ROBOTS_URL_RE = r"^https?://([^/]+)/robots\.txt$"


def derive_robots(pages: DataFrame) -> DataFrame:
    """(host, rules, crawl_delay) from the corpus's ``/robots.txt``
    pages. ``crawl_delay`` is the first ``Crawl-delay:`` directive as a
    double (null when absent); full per-path rule evaluation stays in
    the scheduler's ``urllib.robotparser`` — this is ingest, not
    policy."""
    r = pages.filter(F.col("url").rlike(_ROBOTS_URL_RE))
    return r.select(
        F.regexp_extract("url", _ROBOTS_URL_RE, 1).alias("host"),
        F.decode(F.col("html"), "utf-8").alias("rules"),
    ).withColumn(
        "crawl_delay",
        F.nullif(
            F.regexp_extract("rules", r"(?i)crawl-delay:\s*([0-9.]+)", 1),
            F.lit(""),
        ).cast("double"),
    ).dropDuplicates(["host"])
