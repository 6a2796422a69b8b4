"""Lexical relevance scoring over the document corpus — BM25.

A training-data pipeline uses this two ways: retrieving topical
subsets ("give me the docs about X" for targeted mixes) and as a
quality prior (query = domain seed terms). The implementation is pure
relational algebra — the score is a sum over (doc, term) rows — so
Catalyst handles it JVM-side end-to-end.

Scale shape: the corpus explodes to (doc_id, term) only for terms in
the query (the ``isin`` filter sits inside the scan projection, so
non-matching words die before any shuffle); document-frequency and
corpus stats are term-count-sized and broadcast back.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols,
    k: int,
    rank_col: str = "rn",
    salt_buckets: int = 16,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Exact top-k per group, skew-immune: a plain
    ``Window.partitionBy(group)`` funnels EVERY row of a group through
    one task — with a handful of groups (market segments, languages)
    that is a handful of tasks for the whole table. Phase 1 ranks
    within (group, salt) partitions — salt from a hash of the whole
    row's order key, so the fan-out is ``salt_buckets`` tasks per
    group — and keeps each partition's local top-k; phase 2 ranks the
    surviving ``k * salt_buckets`` rows per group, a trivially small
    window. Results are exactly the unsalted window's (top-k of a
    union = top-k of per-part top-ks); ``order_cols`` must be a total
    order (include a unique tiebreak) for a deterministic ``rank_col``.
    ``salt_on`` (default: every df column) feeds the salt hash — any
    deterministic row identity works, the salt only spreads rows.
    """
    order_cols = list(order_cols)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in (salt_on or df.columns)]),
        F.lit(salt_buckets),
    )
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    local = (
        df.withColumn("_salt", salt)
        .withColumn("_lrn", F.row_number().over(w1))
        .filter(F.col("_lrn") <= k)
        .drop("_salt", "_lrn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        local.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of ``query_terms`` for every document containing at
    least one term. Returns (id_col, score) with score rounded to 4
    decimals (float-summation-order safe for oracle comparison).

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) — the standard
    non-negative variant.
    """
    terms = [str(t) for t in query_terms]
    words = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w").isin(terms))
    tf = words.groupBy(id_col, "w").agg(F.count("*").alias("tf"))

    dl = docs.select(
        id_col, F.size(F.split(F.col(text_col), " ")).alias("dl")
    )
    # corpus stats as a 1-row broadcast (no driver-side scalar plumbing)
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl"),
    )
    # (r6 note: deriving df as tf.groupBy(w).count() to share tf's
    # exchange via AQE reuse was tried and rejected — Catalyst prunes
    # the count out of the reused branch and infers an isnotnull
    # filter on only one side, so the subtrees never canonicalize
    # equal and wall time was flat; see OPTIMIZATION_r06.md)
    df_t = tf.groupBy("w").agg(F.countDistinct(id_col).alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "w")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("part"), 4).alias("bm25")
    )
