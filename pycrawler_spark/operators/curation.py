"""Training-data curation operators (beyond-reference, task brief):
deterministic dataset splitting, benchmark decontamination, and
sequence packing — the steps between "deduped web text" and "batches
a trainer can consume".

Every operator here is either pure-relational (JVM, oracle-checked in
DuckDB) or an explicitly-stateful kernel whose oracle is a recursive
CTE; none touches Python per-row in a scan.
"""

from __future__ import annotations

from typing import Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Tuple[int, int, int] = (90, 5, 5),
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    id hash — stable across runs, machines and engine versions (md5 is
    pinned everywhere), so re-processing a grown corpus never moves an
    old document between splits.

    The bucket is the first 8 md5 hex chars parsed as an integer,
    mod 100: real hash bits, so every bucket 0-99 is reachable and
    near-uniform (modulo bias 1/2^32). The earlier ascii-code-point
    formula left 5 of 100 buckets permanently empty and skewed the
    advertised (90,5,5) to ~(87,6.6,6.3). DuckDB twin:
    ``('0x' || substr(md5(id), 1, 8))::BIGINT % 100``.
    """
    if sum(weights) != 100:
        raise ValueError(f"split weights must sum to 100, got {weights}")
    t, v, _ = weights
    h = F.md5(F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 100
    return df.withColumn("bucket", bucket.cast("int")).withColumn(
        "split",
        F.when(F.col("bucket") < t, "train")
        .when(F.col("bucket") < t + v, "val")
        .otherwise("test"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    ``ngram``-gram with a held-out benchmark set (the standard
    n-gram-overlap protocol). Returns (id, n_hits, contaminated).

    Plan shape: benchmark n-grams are DISTINCT and tiny (eval sets are
    KBs against a 100 TB corpus) -> broadcast hash join against the
    exploded corpus n-grams; the corpus side shuffles nothing and the
    text column never leaves the scan.
    """
    from pycrawler_spark.operators.dedup import shingle

    bench_grams = (
        shingle(benchmark, text_col, id_col, k=ngram)
        .select("shingle")
        .distinct()
    )
    doc_grams = shingle(docs, text_col, id_col, k=ngram)
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def boilerplate_shingle_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    k: int = 2,
    min_docs: int = 5,
) -> DataFrame:
    """CCNet-style boilerplate detection, shingle form: a k-gram that
    appears in >= ``min_docs`` distinct documents of the SAME group
    (source/host) is boilerplate (nav bars, footers, legal blurbs —
    the spans that repeat across one site's pages). Returns per-doc
    (n_shingles, n_boiler, boiler_ratio) for filtering or masking.

    Shuffle shape — a TRUE single pass over the shingle explode (the
    job's biggest intermediate: tokenize + k-gram transform + explode
    over full text is consumed exactly once, no cache/persist to size
    or evict), with exactly ONE occurrence-sized exchange:

    1. the group column rides through the explode itself
       (``shingle(extra_cols=[group_col])``) — no re-join of the
       occurrence table back onto docs;
    2. ``shingle`` already emits DISTINCT shingles per doc
       (``array_distinct``), so one row per (group, shingle-hash, doc)
       holds by construction — the old ``groupBy(...).count()``
       always computed ``_occ = 1`` and was a provably redundant full
       shuffle of the biggest intermediate;
    3. a count() window over (group, shingle-hash) — THE one
       occurrence-sized exchange, keyed by 8-byte xxhash64 longs, never text
       (partition size bounded by docs-per-group, the same bound a
       countDistinct would have);
    4. aggregate by doc: n_shingles = count(*), n_boiler =
       count(nd >= min_docs) — map-side partial, so its exchange
       carries doc-sized partial rows, not occurrences.
    """
    from pyspark.sql import Window

    from pycrawler_spark.operators.dedup import shingle

    # NULL-id docs are dropped up front: the pre-r5 form attached the
    # group column with an equi-join on id_col, which silently dropped
    # them — without this filter they would now both count toward _nd
    # (flipping n_boiler for real docs) and emit a NULL-id output row
    # shingle identity is xxhash64 (8-byte long), not md5 (32-char hex
    # string): the count() window below shuffles one occurrence-sized
    # row per (doc, shingle), and the hash is the widest column in it —
    # the long key cuts those exchange bytes ~60% and hashes cheaper
    # (r6, measured 0.99 -> 0.92 s noop at sf0.1; rows identical).
    # Same collision reasoning as quality.ngram_repetition_stats: the
    # stats only need a consistent injective-enough key (~2^-64 per
    # shingle pair), not the shingle text.
    per_pair = shingle(
        docs.filter(F.col(id_col).isNotNull()),
        text_col, id_col, k=k, extra_cols=[group_col],
    ).select(id_col, group_col, F.xxhash64("shingle").alias("sh"))
    nd = F.count("*").over(Window.partitionBy(group_col, "sh"))
    return (
        per_pair.withColumn("_nd", nd)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("_n"),
            F.sum(
                # NULL groups never mark boilerplate — matches the
                # join form (NULL keys don't match in an equi-join)
                F.when(
                    (F.col("_nd") >= min_docs)
                    & F.col(group_col).isNotNull(),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("_nb"),
        )
        .select(
            id_col,
            F.col("_n").cast("long").alias("n_shingles"),
            F.col("_nb").cast("long").alias("n_boiler"),
            F.round(F.col("_nb") / F.col("_n"), 4).alias("boiler_ratio"),
        )
    )


def hash_sample(
    df: DataFrame,
    rates: dict,
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its salted id
    hash lands under the group's rate (per-mille resolution). Stable
    across runs/engines like hash_split — reprocessing a grown corpus
    keeps every previously-sampled document — and the salt decorrelates
    it from hash_split's bucket, so sampling never biases a split.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("sample:"),
                                          F.col(id_col).cast("string"))),
                           1, 8), 16, 10).cast("long") % 1000
    )
    # round, not truncate: float artifacts (0.29*1000 == 289.99997)
    # would silently lower the effective rate by one per-mille
    rate_col = F.lit(int(round(default_rate * 1000)))
    for g, r in sorted(rates.items()):
        rate_col = F.when(
            F.col(group_col) == g, F.lit(int(round(r * 1000)))
        ).otherwise(rate_col)
    return df.withColumn("_b", bucket).filter(F.col("_b") < rate_col).drop("_b")


def fuzzy_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate benchmark contamination (the n-gram-overlap
    protocol of :func:`decontaminate` catches verbatim leaks; this
    catches PARAPHRASED ones): a training doc whose MinHash signature
    shares any band with any benchmark doc is flagged. Returns
    (id_col, n_hit_bands, contaminated_fuzzy).

    Plan shape: benchmark signatures are eval-set-sized -> broadcast;
    the corpus side computes signatures in one explode+agg and joins
    on (band_id, band_value) without shuffling documents.
    """
    from pycrawler_spark.operators.dedup import DEFAULT_SALTS, minhash_signatures

    salts = list(DEFAULT_SALTS)
    sig_d = minhash_signatures(docs, text_col, id_col, salts=salts)
    sig_b = minhash_signatures(benchmark, text_col, id_col, salts=salts)

    def bands(sig: DataFrame, out_id: str) -> DataFrame:
        pairs = F.array(*[
            F.struct(F.lit(i).alias("band"), F.col(f"mh_{i}").alias("v"))
            for i in range(len(salts))
        ])
        return sig.select(
            F.col(id_col).alias(out_id), F.explode(pairs).alias("b")
        ).select(out_id, F.col("b.band").alias("band"), F.col("b.v").alias("v"))

    hits = (
        bands(sig_d, "d_id")
        .join(F.broadcast(bands(sig_b, "b_id")), ["band", "v"])
        .groupBy("d_id")
        .agg(F.countDistinct("band").alias("n_hit_bands"))
    )
    return (
        docs.select(id_col)
        .join(hits.withColumnRenamed("d_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_bands", F.lit(0)).cast("long").alias("n_hit_bands"),
            (F.coalesce("n_hit_bands", F.lit(0)) > 0).alias("contaminated_fuzzy"),
        )
    )


PACK_SCHEMA = "doc_id long, lang string, n_tokens long, pack_id long"


def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing: within each group (shard), documents
    in id order are appended to the current pack until it would exceed
    ``capacity`` tokens, then a new pack starts (documents longer than
    capacity get a pack of their own). The id-ordered greedy fold is
    inherently sequential PER SHARD — exactly the per-task-kernel
    shape of the crawl's budget loop — so it runs as one
    ``applyInPandas`` per group; shards pack in parallel and a pack
    never spans shards (what a trainer wants: shard-local files).

    Oracle: a DuckDB recursive CTE replays the same fold row-by-row
    (see ``_o45`` in the entry contract), value-checking the stateful
    kernel end-to-end.
    """
    toks = docs.select(
        id_col,
        group_col,
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        pack, fill = 1, 0
        packs = []
        for n in pdf["n_tokens"]:
            if fill and fill + n > capacity:
                pack += 1
                fill = 0
            fill += n
            packs.append(pack)
        pdf["pack_id"] = packs
        return pdf[["doc_id", "lang", "n_tokens", "pack_id"]]

    return toks.groupBy(group_col).applyInPandas(kernel, PACK_SCHEMA)
