"""Stateful streaming politeness scheduler (T7 north rule, streaming
form) — ``applyInPandasWithState`` per-host token bucket.

The batch scheduler (operators/scheduler.py) re-derives each wave's
per-host allowance from scratch: every depth wave grants at most
``host_wave_budget`` URLs per host, which is correct for the
bulk-synchronous driver loop but forgets between waves. The
long-running stream mode wants a *continuous* politeness ledger: a
host that sat idle for a while may burst a little (accumulated
allowance), a host hammered in the last micro-batch must wait — the
token-bucket semantics real crawl schedulers use, and exactly the
shape Spark's ``applyInPandasWithState`` exists for (arbitrary
per-key state across micro-batches).

Semantics per host (key) per micro-batch:

* state = tokens available, capped at ``capacity``
* on each batch: ``tokens = min(capacity, tokens + refill)`` then the
  batch's rows, in ``seq`` order (the reference's insertion-order
  dequeue, database.py:257-285), are granted while tokens last;
  ungranted rows are emitted with ``granted=false`` so the caller can
  re-enqueue them (they stay in the frontier — the engine's frontier
  is the replay source, so nothing is lost).
* robots-disallowed rows (same rules table as the batch scheduler)
  are emitted ``blocked=true`` and never consume tokens.

The reference analog: WAIT_BEFORE_LOAD/WAIT_AFTER_LOAD serialize one
site's fetches (config-example.py:48-50, crawler.py:163-169) — i.e.
refill ≈ wave_interval / per_page_cost, which is exactly
``CrawlConfig.host_wave_budget``.
"""

from __future__ import annotations

import os
from typing import Any, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GRANT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("task_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_norm", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("batch_pos", T.LongType()),   # grant order within host
        T.StructField("granted", T.BooleanType()),
        T.StructField("blocked", T.BooleanType()),
        T.StructField("tokens_left", T.LongType()),  # post-batch bucket level
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("tokens", T.LongType())])

# state-store provider shortcuts for the stateful entry points. The
# default (None) keeps Spark's HDFS-backed in-memory provider — fine
# for wave-bounded state; "rocksdb" is the 10^10-key choice (state
# spills to local SSD instead of executor heap; see SCALE.md).
_STATE_PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider",
}

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def apply_state_provider(spark: SparkSession, provider: Optional[str]):
    """Set the streaming state-store provider for queries STARTED
    after this call (Spark captures session confs at query start).
    ``provider``: ``"rocksdb"``, ``"hdfs"``, a fully-qualified provider
    class name, or None (leave the session conf untouched). Returns a
    zero-arg restore callable so availableNow-style callers can put
    the previous session value back after termination."""
    if provider is None:
        return lambda: None
    cls = _STATE_PROVIDERS.get(provider.lower(), provider)
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, cls)

    def restore():
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)

    return restore

FRONTIER_STREAM_SCHEMA = (
    "task_id long, url string, url_norm string, host string, "
    "depth int, repetition int, seq long, from_url string"
)


def robots_blocked_udf():
    """Arrow-batched (url, rules) -> blocked predicate. Parsers are
    cached per distinct rules body within a batch (hosts overwhelmingly
    share a handful of robots templates), so the per-row cost is a
    dict hit + prefix match."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BooleanType())
    def blocked(url: pd.Series, rules: pd.Series) -> pd.Series:
        import urllib.robotparser

        cache: dict = {}
        out = []
        for u, r in zip(url, rules):
            if r is None or (isinstance(r, float) and pd.isna(r)):
                out.append(False)
                continue
            p = cache.get(r)
            if p is None:
                p = urllib.robotparser.RobotFileParser()
                p.parse(str(r).splitlines())
                cache[r] = p
            out.append(not p.can_fetch("*", u))
        return pd.Series(out)

    return blocked


def _bucket_fn(refill: int, capacity: int):
    """Build the per-host stateful kernel. Robots decisions arrive as
    a precomputed ``blocked`` column (stream-static join upstream) —
    the kernel itself holds no rules table, so neither the driver nor
    any single executor ever materializes O(#hosts) state."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        (tokens,) = state.get if state.exists else (0,)
        tokens = min(capacity, tokens + refill)

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("seq", kind="mergesort")
        granted, blocked, pos = [], [], []
        n_granted = 0
        for is_blocked in rows["blocked"]:
            if bool(is_blocked):
                blocked.append(True)
                granted.append(False)
                pos.append(-1)
                continue
            blocked.append(False)
            if tokens > 0:
                granted.append(True)
                tokens -= 1
                pos.append(n_granted)
                n_granted += 1
            else:
                granted.append(False)
                pos.append(-1)
        state.update((tokens,))
        out = pd.DataFrame(
            {
                "host": host,
                "task_id": rows["task_id"].values,
                "url": rows["url"].values,
                "url_norm": rows["url_norm"].values,
                "depth": rows["depth"].values,
                "seq": rows["seq"].values,
                "batch_pos": pd.array(pos, dtype="int64"),
                "granted": granted,
                "blocked": blocked,
                "tokens_left": pd.array([tokens] * len(rows), dtype="int64"),
            }
        )
        yield out

    return fn


def stream_schedule(
    spark: SparkSession,
    frontier_dir: str,
    out_dir: str,
    robots: Optional[DataFrame] = None,
    refill: int = 10,
    capacity: Optional[int] = None,
    available_now: bool = True,
    checkpoint: Optional[str] = None,
    state_store_provider: Optional[str] = None,
):
    """Continuous politeness scheduling over a frontier file stream.

    ``frontier_dir``: directory of parquet files with
    FRONTIER_STREAM_SCHEMA rows (e.g. the engine's frontier deltas, or
    a dedicated scheduling queue); one file per micro-batch so the
    token bucket ticks per file (``maxFilesPerTrigger=1``).
    ``refill``: tokens added per micro-batch (≈ host_wave_budget);
    ``capacity`` defaults to 2×refill (one wave of burst headroom).
    ``state_store_provider``: ``"rocksdb"`` / ``"hdfs"`` / full class
    name — set on the session just for this query's start (see
    :func:`apply_state_provider`); default None keeps the session's
    provider (HDFS-backed unless the caller changed it). Per-host
    token state is O(#hosts) — at millions of hosts pass "rocksdb".

    Writes grant rows (GRANT_SCHEMA) to ``out_dir`` as parquet.
    """
    capacity = capacity if capacity is not None else 2 * refill
    # restore guard spans plan building AND start(), nothing more: an
    # analysis error before start() must not leak the provider into
    # the session, and the session value must be back as soon as the
    # query has captured its conf — another thread starting a query
    # during an availableNow drain must not inherit the override
    # (stream_seen_filter has the same shape)
    restore_provider = apply_state_provider(spark, state_store_provider)
    try:
        q, rules_cached = _stream_schedule_build(
            spark, frontier_dir, out_dir, robots, refill, capacity,
            available_now, checkpoint,
        )
    finally:
        restore_provider()
    if available_now:
        try:
            q.awaitTermination()
        finally:
            # unpersist even when the drain raises — retries must not
            # accumulate pinned copies of the rules table
            if rules_cached is not None:
                rules_cached.unpersist()
    return q


def _stream_schedule_build(
    spark, frontier_dir, out_dir, robots, refill, capacity,
    available_now, checkpoint,
):
    rules_cached = None
    stream = (
        spark.readStream.schema(FRONTIER_STREAM_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(frontier_dir)
        .filter(F.col("repetition") == 1)
    )
    if robots is not None:
        # stream-static LEFT join on host: the rules table stays a
        # distributed DataFrame end-to-end — no driver collect, no
        # monolithic broadcast (both are O(#hosts) memory on one
        # process, multi-GB at the stated millions-of-hosts target).
        # The join's host-hash partitioning is the SAME partitioning
        # the stateful groupBy(host) needs, so the frontier still
        # shuffles once; the rules column is consumed by the blocked
        # predicate and dropped before the state operator.
        # one rule row per host (deterministic max): a duplicate host
        # row (e.g. robots refetched across waves, unioned sources)
        # would otherwise DUPLICATE every frontier row for that host
        # through the join — the old driver-dict route collapsed
        # duplicates implicitly
        # persisted: the static side of a stream-static join re-runs
        # its plan every micro-batch — without the cache the host
        # dedup aggregation would re-shuffle the rules table per
        # batch. Unpersisted on the availableNow path below; a caller
        # of the long-running (available_now=False) variant owns the
        # query's lifetime and with it this cache entry.
        rules_cached = (
            robots.groupBy("host")
            .agg(F.max("rules").alias("_rules"))
            .persist()
        )
        stream = (
            stream.join(rules_cached, "host", "left")
            .withColumn(
                "blocked", robots_blocked_udf()(F.col("url"), F.col("_rules"))
            )
            .drop("_rules")
        )
    else:
        stream = stream.withColumn("blocked", F.lit(False))
    scheduled = (
        stream.groupBy("host")
        .applyInPandasWithState(
            _bucket_fn(refill, capacity),
            outputStructType=GRANT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        scheduled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation",
            checkpoint or os.path.join(out_dir + "_ckpt"),
        )
    )
    q = writer.trigger(availableNow=available_now).start()
    return q, rules_cached
