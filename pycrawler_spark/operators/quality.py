"""Relational text-quality operators (training-data pipeline,
beyond-reference surface) — the repetition and rollup signals a
web-text curation pass computes alongside the Gopher word-level rules
(see ``_q41_gopher_quality`` in the entry contract).

Everything here is pure JVM column algebra (explode + aggregations):
no Python touches a row, every shuffle is keyed by (doc_id) or
(group), and the text column never leaves the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ngram_repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style n-gram repetition signals, token-occurrence form:

    * ``top_bigram_share`` — fraction of bigram occurrences taken by
      the single most frequent bigram (Gopher's "fraction in the most
      frequent 2-gram", over occurrences instead of characters —
      documented simplification, monotone in the same signal),
    * ``dup_trigram_frac`` — fraction of trigram occurrences whose
      trigram appears more than once in the document (Gopher's
      "fraction in duplicated n-grams").

    Shuffle shape: NONE. Both signals are within-document statistics,
    so exploding grams into rows and aggregating them back (the
    pre-r5 form: two explode -> groupBy(doc, md5(gram)) ->
    groupBy(doc) chains plus a join — five exchanges of
    occurrence-sized data) moves data between executors only to bring
    it back to the row it came from. Instead each document sorts its
    gram-hash array and folds run lengths in ONE ``aggregate`` pass:
    the longest run is the top gram count, runs of length >= 2 are
    the duplicated occurrences. Pure map stage — at 100 TB it scales
    with input splits and shuffles nothing (plan pinned by
    ``test_ngram_repetition_plan_no_exchange``). Gram identity is a
    hash in both forms (md5 relationally, variadic xxhash64 here), so
    the statistics are identical up to hash collisions (~2^-64 per
    gram pair) — pinned bit-identical to the relational form by
    ``test_ngram_repetition_matches_relational_form`` and the q48
    oracle.
    """
    # NULL-text docs are dropped, preserving the relational form's
    # semantics (exploding a NULL gram array yields no rows, so the
    # pre-r5 form emitted nothing for them; the fold form would
    # otherwise send NULL through the short-doc branch and fabricate a
    # degenerate one-gram row — r5 advisor finding, fixed r6)
    toks_df = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
    n_toks = F.size(F.col("_toks"))

    def sorted_gram_hashes(k: int) -> Column:
        # gram identity = dedup.token_shingle_hash (one variadic
        # xxhash64 over the k token strings, element_at, zero
        # per-position allocations): counting runs of equal values
        # only needs a CONSISTENT injective-enough key, not the gram
        # text (same lesson as winnow_fingerprints; see BENCH.md).
        # Docs shorter than k keep the degenerate "one gram = the
        # whole doc" semantics of the relational form — element_at
        # past the end would throw under ANSI, so that case is its
        # own branch.
        from pycrawler_spark.operators.dedup import token_shingle_hash

        full = F.transform(
            F.sequence(F.lit(0), n_toks - k),
            lambda i: token_shingle_hash(F.col("_toks"), i, k),
        )
        short = F.array(F.xxhash64(F.concat_ws(" ", F.col("_toks"))))
        return F.array_sort(
            F.when(n_toks >= k, full).otherwise(short))

    # staged (multi-referenced below) so CollapseProject keeps the
    # sort out of the consuming aggregate lambdas
    grams_df = toks_df.select(
        F.col(id_col),
        sorted_gram_hashes(2).alias("_g2"),
        sorted_gram_hashes(3).alias("_g3"),
    )

    def max_run(arr: Column) -> Column:
        """Length of the longest run of equal values in a SORTED
        array == the count of the most frequent value."""
        return F.aggregate(
            arr,
            F.struct(F.lit(None).cast("bigint").alias("prev"),
                     F.lit(0).alias("run"), F.lit(0).alias("best")),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc.best,
                    F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda acc: acc.best,
        )

    def dup_occurrences(arr: Column) -> Column:
        """Number of elements of a SORTED array whose value occurs
        more than once: a run's 2nd element retroactively counts the
        1st (+2), later elements +1 each."""
        return F.aggregate(
            arr,
            F.struct(F.lit(None).cast("bigint").alias("prev"),
                     F.lit(0).alias("run"), F.lit(0).alias("dups")),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
                .alias("run"),
                (acc.dups + F.when(
                    x == acc.prev,
                    F.when(acc.run == 1, F.lit(2)).otherwise(F.lit(1)),
                ).otherwise(F.lit(0))).alias("dups"),
            ),
            lambda acc: acc.dups,
        )

    return grams_df.select(
        F.col(id_col),
        F.round(max_run(F.col("_g2")) / F.size(F.col("_g2")), 4)
        .alias("top_bigram_share"),
        F.round(dup_occurrences(F.col("_g3")) / F.size(F.col("_g3")), 4)
        .alias("dup_trigram_frac"),
    )


def unigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Language-model quality scoring, unigram form (the relational
    stand-in for CCNet's KenLM perplexity filter): train add-one-
    smoothed unigram probabilities on the corpus itself, then score
    each document by its mean token log-probability. Documents full of
    corpus-typical words score high; gibberish / rare-token spam
    scores low. Deterministic and engine-portable — no model files.

    Plan shape: one explode + a vocab-sized count table; the scoring
    join is keyed by word (the count table is vocab-sized, typically
    broadcastable; at web scale the join shuffles (doc_id, word)
    pairs, never text). Returns (id_col, n_tokens, avg_logprob) with
    avg_logprob rounded to 4 decimals.
    """
    words = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count("*").alias("c"))
    # corpus totals as a 1-row broadcast, same pattern as bm25_scores
    totals = vocab.agg(
        F.sum("c").cast("double").alias("n_total"),
        F.count("*").cast("double").alias("n_vocab"),
    )
    scored = (
        words.join(vocab, "w")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "lp",
            F.log((F.col("c") + 1.0) / (F.col("n_total") + F.col("n_vocab"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )


def group_quality_rollup(
    docs: DataFrame,
    group_cols=("source", "lang"),
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    min_uniq_ratio: float = 0.2,
) -> DataFrame:
    """Per-(source, lang) corpus audit: document counts, mean length,
    and the pass rate of the cheap quality gate (n_words >= min_words
    AND unique-word ratio >= min_uniq_ratio). The table a curation run
    reads to decide which domains to keep, reweight, or drop.

    One explode + two aggregations; the final rollup is
    |groups|-sized.
    """
    words = docs.select(
        id_col, *group_cols,
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    per_doc = words.groupBy(id_col, *group_cols).agg(
        F.count("*").alias("n_words"),
        F.countDistinct("w").alias("n_uniq"),
    )
    passes = (F.col("n_words") >= min_words) & (
        (F.col("n_uniq") / F.col("n_words")) >= min_uniq_ratio
    )
    return per_doc.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_words"), 2).alias("avg_words"),
        F.round(
            F.avg(F.when(passes, 1.0).otherwise(0.0)), 4
        ).alias("pass_rate"),
    )
