"""Similarity search over embedding columns (training-data operator).

Two paths over ``embeddings(vec_id, embedding: array<float>, ...)``:

* :func:`brute_force_topk` — exact cosine top-k, JVM-side
  ``aggregate``/``zip_with`` arithmetic (no Python in the scan);
  the correctness baseline and the right answer below ~10^7 rows.
* :func:`lsh_topk` — random-hyperplane LSH (sign-bit signatures via a
  seeded numpy projection in ONE vectorized pandas UDF pass), probing
  only the query's hash bucket ± multi-probe neighbors. The 100 TB
  path: the bucket index is computed once, persisted, and each query
  touches a ~1/2^bits fraction of rows.

Recall of the LSH path against the brute-force baseline is asserted
in tests (tests/test_dataops.py).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window


def _cos_cols(emb: str, q: str):
    dot = F.expr(
        f"aggregate(zip_with({emb}, {q}, (x, y) -> x * y), 0D, (a, v) -> a + v)"
    )
    nrm = F.expr(
        f"sqrt(aggregate({emb}, 0D, (a, x) -> a + x * x)) * "
        f"sqrt(aggregate({q}, 0D, (a, x) -> a + x * x))"
    )
    return dot / nrm


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: List[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    q = F.lit(query_vec).cast("array<double>")
    scored = embeddings.withColumn("qv", q).select(
        id_col,
        _cos_cols(f"cast({emb_col} as array<double>)", "qv").alias("cos_sim"),
    )
    # orderBy().limit(k) plans as TakeOrderedAndProject: each partition
    # keeps its local top-k and the driver merges k*partitions rows.
    # The previous Window.orderBy + row_number shipped EVERY scored row
    # through one task — a single-partition sort of the whole table at
    # 10^9 rows. The rank window now runs over <= k rows only.
    top = scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


def add_lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    emb_col: str = "embedding",
) -> DataFrame:
    """Sign-bit bucket id per row — one numpy matmul per Arrow batch.
    Persist the result (bucket the table by ``bucket`` at scale)."""
    planes = hyperplanes(dim, bits, seed)

    @pandas_udf(T.IntegerType())
    def bucket_udf(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # (batch, dim)
        signs = (mat @ planes.T) > 0  # (batch, bits)
        out = np.zeros(len(emb), dtype=np.int32)
        for b in range(planes.shape[0]):
            out |= signs[:, b].astype(np.int32) << b
        return pd.Series(out)

    return embeddings.withColumn("bucket", bucket_udf(F.col(emb_col)))


def _probe_buckets(qbucket: int, bits: int, n_flip: int) -> List[int]:
    """Multi-probe: the query bucket plus all buckets at Hamming
    distance 1 (and 2 when n_flip >= 2)."""
    out = {qbucket}
    for i in range(bits):
        out.add(qbucket ^ (1 << i))
        if n_flip >= 2:
            for j in range(i + 1, bits):
                out.add(qbucket ^ (1 << i) ^ (1 << j))
    return sorted(out)


def lsh_topk(
    bucketed: DataFrame,
    query_vec: List[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    n_flip: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only rows in the query's (multi-probe) buckets.
    The bucket filter is a plain IN-list predicate -> partition/file
    pruning when the table is written bucketed/sorted by ``bucket``."""
    planes = hyperplanes(len(query_vec), bits, seed)
    q = np.asarray(query_vec)
    qbucket = 0
    for b, plane in enumerate(planes):
        if float(plane @ q) > 0:
            qbucket |= 1 << b
    probes = _probe_buckets(qbucket, bits, n_flip)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, id_col, emb_col)


def ivf_fit(
    emb: DataFrame,
    n_centroids: int = 16,
    dim: int = 64,
    iters: int = 5,
    seed: int = 42,
    emb_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF ANN (deterministic:
    seeded random-unit init, fixed iteration count, ties broken by
    lowest cell id in argmax).

    Scale shape: each Lloyd iteration is one assignment pass (numpy
    matmul per Arrow batch) + one ``groupBy(cell, pos).avg`` over the
    posexploded vectors; only the (n_centroids x dim) centroid matrix
    ever reaches the driver. 10^9 rows is iters x 2 shuffle-light jobs.
    """
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    for _ in range(iters):
        assigned = ivf_assign(emb, c, emb_col)
        rows = (
            assigned.select("cell", F.posexplode(F.col(emb_col)).alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        nxt = c.copy()  # empty cells keep their centroid
        seen_cells = {r["cell"] for r in rows}
        for cell in seen_cells:
            nxt[cell] = 0.0
        for r in rows:
            nxt[r["cell"]][r["pos"]] = r["m"]
        norms = np.linalg.norm(nxt, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        c = nxt / norms
    return c


def ivf_fit_local(
    mat: np.ndarray,
    n_centroids: int = 16,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Driver-side numpy twin of :func:`ivf_fit` — same seeded init,
    same assignment rule (argmax dot of the L2-normalized row, ties to
    the lowest cell), same per-cell mean + renormalize update, same
    empty-cell handling. Used to pin the quantizer as inlinable
    constants for the DuckDB oracle (the distributed :func:`ivf_fit`
    is the scale path; equivalence is asserted in tests)."""
    mat = np.asarray(mat, dtype=np.float64)
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, mat.shape[1]))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    for _ in range(iters):
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cells = np.argmax((mat / norms) @ c.T, axis=1)
        nxt = c.copy()  # empty cells keep their centroid
        for cell in np.unique(cells):
            nxt[cell] = mat[cells == cell].mean(axis=0)
        n2 = np.linalg.norm(nxt, axis=1, keepdims=True)
        n2[n2 == 0] = 1.0
        c = nxt / n2
    return c


def ivf_assign(
    emb: DataFrame, centroids: np.ndarray, emb_col: str = "embedding"
) -> DataFrame:
    """Adds ``cell`` = argmax-dot centroid id (one numpy matmul per
    Arrow batch). Persist + bucket the table by ``cell`` at scale so
    probes prune files, exactly like the LSH ``bucket`` column."""
    cmat = centroids.astype(np.float64)

    @pandas_udf(T.IntegerType())
    def cell_udf(col: pd.Series) -> pd.Series:
        mat = np.stack(col.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ cmat.T
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return emb.withColumn("cell", cell_udf(F.col(emb_col)))


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: List[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: score only rows in the ``n_probe`` cells whose
    centroids are nearest the query. The cell filter is an IN-list
    predicate — file/partition pruning when the table is bucketed by
    cell. Complements :func:`lsh_topk`: IVF adapts its partitions to
    the data distribution (clustered corpora probe fewer rows), LSH
    needs no training pass."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-30)
    sims = centroids @ qn
    probes = [int(i) for i in np.argsort(-sims)[:n_probe]]
    cand = assigned.filter(F.col("cell").isin(probes))
    return brute_force_topk(cand, query_vec, k, id_col, emb_col)


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (training-data dedup op):
    all (id_a < id_b) pairs with cosine >= threshold, JVM-side
    arithmetic only.

    This is the exact O(n^2) baseline (right below ~10^6 rows after
    blocking); the scale path is :func:`lsh_blocked_cosine_pairs`,
    which blocks by random-hyperplane bucket first — candidates far
    apart in sign-space are overwhelmingly unlikely to be
    near-duplicates at high thresholds.
    """
    # double math end-to-end: float32 products differ from an
    # oracle computing in double by ~1e-8, which flips round(.,6) ties
    va = F.col(vec_col).cast("array<double>")
    a = emb.select(F.col(id_col).alias("id_a"), va.alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), va.alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (a, v) -> a + v)"
        " / (sqrt(aggregate(va, 0D, (a, x) -> a + x * x))"
        " * sqrt(aggregate(vb, 0D, (a, x) -> a + x * x)))"
    )
    return (
        pairs.withColumn("cos", F.round(cos, 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def lsh_blocked_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    n_flip: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket-blocked — the
    100 TB path promised by :func:`cosine_dup_pairs`.

    Plan shape: one :func:`add_lsh_bucket` pass (numpy matmul per Arrow
    batch), then an equi-join on bucket id instead of a cross product —
    the shuffle is keyed by a 4-byte bucket, each task pairs only
    within one bucket (~n/2^bits rows), and the exact double-precision
    cosine runs only on candidate pairs. Multi-probe (``n_flip=1``
    flips each signature bit once on ONE side of the join) recovers
    pairs that straddle a hyperplane; because only side B explodes to
    probe buckets and side A keeps its own bucket, every qualifying
    pair meets on exactly one key — no distinct needed.

    Recall vs the exact :func:`cosine_dup_pairs` is probabilistic
    (rises with n_flip, falls with bits); asserted in
    tests/test_dataops.py on the test embeddings.
    """
    b = add_lsh_bucket(emb, dim, bits, seed, vec_col)
    va = F.col(vec_col).cast("array<double>")
    left = b.select(
        F.col(id_col).alias("id_a"), va.alias("va"), F.col("bucket")
    )
    flips = F.array(*[F.lit(0)] + [F.lit(1 << i) for i in range(bits)]) \
        if n_flip >= 1 else F.array(F.lit(0))
    right = (
        b.select(F.col(id_col).alias("id_b"), va.alias("vb"), "bucket")
        .withColumn("probe", F.explode(flips))
        .select(
            "id_b", "vb",
            F.col("bucket").bitwiseXOR(F.col("probe")).alias("bucket"),
        )
    )
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (a, v) -> a + v)"
        " / (sqrt(aggregate(va, 0D, (a, x) -> a + x * x))"
        " * sqrt(aggregate(vb, 0D, (a, x) -> a + x * x)))"
    )
    return (
        pairs.withColumn("cos", F.round(cos, 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
