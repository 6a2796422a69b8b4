"""Per-host politeness + robots.txt scheduler (north-rule operator).

The reference enforces politeness implicitly: one serial crawler per
site with fixed waits around each navigation
(config-example.py:48-50, crawler.py:163-169) — ~0.09 pages/sec/site.
robots.txt support is an unimplemented TODO (config-example.py:57).

Wave-mode equivalent: each host may contribute at most
``host_wave_budget`` URLs per wave (wave_interval / per_page_cost),
and robots-disallowed URLs are marked blocked instead of fetched.
Implemented as a ``groupBy(host).applyInPandas`` priority queue:
within one host group the frontier rows are ordered by ``seq`` (the
reference's insertion-order dequeue, database.py:257-285), robots
rules are evaluated with ``urllib.robotparser``, and the first
``budget`` allowed rows are granted.

Order parity (default FIFO mode, ``priority=None``): within a task,
granted rows are always a seq-prefix of the eligible rows, so
politeness sub-waves never reorder the crawl — they only split a
depth level into consecutive sub-waves. Priority mode
(``priority=<rank DataFrame>``) deliberately BREAKS this invariant:
eligible rows are granted in descending-priority order (seq as
tiebreak), so a high-rank URL can jump ahead of earlier-seq rows
within its host (tested by
``test_priority_mode_reorders_politeness_subwaves``).
"""

from __future__ import annotations

import urllib.robotparser
from typing import List

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField("task_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_norm", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("from_url", T.StringType()),
        T.StructField("granted", T.BooleanType()),
        T.StructField("blocked", T.BooleanType()),
    ]
)

_IN_COLS = ["task_id", "url", "url_norm", "host", "depth", "seq", "from_url"]


def schedule_wave(
    free_rows: DataFrame,
    robots: DataFrame | None,
    host_budget: int,
    obey_robots: bool,
    wave_interval_ms: int = 60_000,
    priority: DataFrame | None = None,
) -> DataFrame:
    """Returns the frontier rows annotated with ``granted`` (fetch this
    wave) / ``blocked`` (robots-disallowed -> never fetch).

    ``free_rows``: columns _IN_COLS. ``robots``: (host, rules
    [, crawl_delay]) or None. A robots ``Crawl-delay`` tightens the
    per-host cap below ``host_budget``: at most
    ``wave_interval / crawl_delay`` fetches of that host fit in one
    wave interval (the reference never implemented robots at all —
    TODO at config-example.py:57 — so this is engine-defined, north
    rule).

    ``priority`` (opt-in): a (url_norm, priority:double) table — e.g.
    PageRank over the discovered link graph (``operators/graph.py``,
    "crawl important pages first") — joined onto the frontier before
    the per-host queue; within one host, eligible rows are then
    granted by DESCENDING priority (ties: ``seq``, so unranked rows
    keep FIFO order among themselves at priority 0). Default ``None``
    preserves the reference's insertion-order dequeue exactly
    (database.py:257-285) — parity mode. The join is left + host-local
    sort, so priority mode adds one equi-join and changes no shuffle
    shape."""
    if robots is None:
        from pycrawler_spark.util import empty_df

        robots = empty_df(free_rows.sparkSession, "host string, rules string")
    rb_cols = ["host", "rules"] + (
        ["crawl_delay"] if "crawl_delay" in robots.columns else []
    )
    rb = robots.select(*rb_cols)
    use_priority = priority is not None
    in_rows = free_rows.select(*_IN_COLS)
    if use_priority:
        # one row per url_norm (deterministic max), same guard as the
        # streaming robots join: a duplicate priority row (e.g. ranks
        # unioned across waves) would otherwise DUPLICATE the frontier
        # row through the join — two identical grant rows, double
        # fetch, stolen budget
        in_rows = in_rows.join(
            priority.groupBy("url_norm").agg(
                F.max(F.col("priority").cast("double")).alias("_prio")
            ),
            "url_norm",
            "left",
        ).select(*_IN_COLS, F.coalesce("_prio", F.lit(0.0)).alias("_prio"))

    def plan(key, rows: pd.DataFrame, rb_rows: pd.DataFrame) -> pd.DataFrame:
        parser = None
        budget = host_budget
        if obey_robots and len(rb_rows):
            parser = urllib.robotparser.RobotFileParser()
            parser.parse(str(rb_rows.iloc[0]["rules"]).splitlines())
            delay = (
                rb_rows.iloc[0].get("crawl_delay")
                if "crawl_delay" in rb_rows.columns else None
            )
            if delay is not None and not pd.isna(delay) and float(delay) > 0:
                budget = min(
                    budget, max(1, int(wave_interval_ms / (float(delay) * 1000)))
                )
        if use_priority:
            rows = rows.sort_values(
                ["_prio", "seq"], ascending=[False, True], kind="mergesort"
            )
        else:
            rows = rows.sort_values("seq", kind="mergesort")
        blocked: List[bool] = []
        granted: List[bool] = []
        used = 0
        for u in rows["url"]:
            if parser is not None and not parser.can_fetch("*", u):
                blocked.append(True)
                granted.append(False)
                continue
            blocked.append(False)
            if used < budget:
                granted.append(True)
                used += 1
            else:
                granted.append(False)
        rows = rows[_IN_COLS].copy()
        rows["granted"] = granted
        rows["blocked"] = blocked
        return rows

    return (
        in_rows.groupBy("host")
        .cogroup(rb.groupBy("host"))
        .applyInPandas(plan, SCHEDULE_SCHEMA)
    )
