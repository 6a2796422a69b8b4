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

from pyspark.sql import DataFrame, functions as F


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
