"""Similarity search over an embedding column (array<float>).

Baseline: brute-force quantized dot-product top-k — `F.zip_with` +
`F.aggregate` (JVM-side higher-order functions, no Python).  Embeddings
are quantized to e3 integers before the product so scores are exact
integers, bit-identical across engines (the DuckDB oracle replays the
same arithmetic).

Scale path: LSH-bucketed variant — SimHash-style sign-random-projection
buckets from the quantized vector, candidates restricted to the probe's
bucket.  At 10^10 vectors, bucket both sides and the probe join is
partition-local; brute force stays available for re-ranking candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantized(col, scale: int = 1000):
    # float32 → double first so the multiply is engine-exact
    return F.transform(
        col, lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _fan_out(df: DataFrame) -> DataFrame:
    from crawlspark.util import fan_out

    return fan_out(df)


def _srp_bucket_from_q(q_col, planes: int):
    """SRP bucket id as a column over an ALREADY-quantized vector
    column — same arithmetic as :func:`srp_bucket` (plane p's ±1 sign
    for dim i is bit (16+p) of the Knuth multiplicative hash of i),
    but the quantize transform is evaluated once per row instead of
    once per plane."""
    bucket = None
    for p in range(planes):
        shift = 1 << (16 + p)
        proj = F.aggregate(
            F.zip_with(
                q_col,
                F.sequence(F.lit(0), F.size(q_col) - 1),
                lambda x, i: F.when(
                    ((i.cast("bigint") * 2654435761) / shift).cast("bigint") % 2 == 0,
                    x,
                ).otherwise(-x),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def _int64_n2_bound(t2_e4: int) -> int:
    """Largest quantized squared-norm for which the exact comparison
    dot²·10⁴ vs t²·na²·nb² provably fits int64 (|dot| ≤ max n2)."""
    return min(
        int((2**63 / 1e4) ** 0.5), int((2**63 / max(1, t2_e4)) ** 0.5)
    )


def _block_matmul_pairs(
    q: DataFrame, t2_e4: int, num_blocks: int, key_cols: list[str]
) -> DataFrame:
    """All-pairs near-dup test WITHIN each ``key_cols`` group (the whole
    corpus when empty; an LSH bucket for the bucketed path) via NumPy
    int64 block matmul — one matrix product per (key, block_a, block_b)
    group instead of an interpreted 64-element zip_with+aggregate per
    pair.  Exactness: e3-quantized int64 end-to-end with an object-dtype
    fallback when quantized norms could overflow the int64 comparison.

    ``q`` columns: ``key_cols + [vec_id, q, n2]``.  Each pair meets in
    exactly one group — a row sides "a" for partner blocks ≥ its own and
    "b" for partner blocks ≤ its own, and diagonal groups restrict to
    id order — so output pairs are unique with a_id < b_id."""
    import numpy as np
    import pandas as pd

    B = num_blocks
    q = q.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(B)).cast("int")
    )
    a_rows = q.select(
        *key_cols,
        F.col("blk").alias("ka"),
        F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("kb"),
        F.lit(0).alias("side"),
        "vec_id", "q", "n2",
    )
    b_rows = q.select(
        *key_cols,
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("ka"),
        F.col("blk").alias("kb"),
        F.lit(1).alias("side"),
        "vec_id", "q", "n2",
    )
    both = a_rows.unionByName(b_rows)
    n2_bound = _int64_n2_bound(t2_e4)

    def matmul(key, pdf):
        # the last two key elements are (ka, kb); any leading elements
        # are the caller's grouping (e.g. the SRP bucket)
        asub = pdf[pdf["side"] == 0]
        bsub = pdf[pdf["side"] == 1]
        if asub.empty or bsub.empty:
            return pd.DataFrame({"a_id": [], "b_id": [], "dot": []}).astype(
                {"a_id": "int64", "b_id": "int64", "dot": "int64"}
            )
        A = np.stack(asub["q"].to_numpy()).astype(np.int64)
        Bm = np.stack(bsub["q"].to_numpy()).astype(np.int64)
        na2 = asub["n2"].to_numpy(dtype=np.int64)
        nb2 = bsub["n2"].to_numpy(dtype=np.int64)
        exact = max(int(na2.max()), int(nb2.max())) > n2_bound
        if exact:  # arbitrary-precision path: correctness at any scale
            A, Bm = A.astype(object), Bm.astype(object)
            na2, nb2 = na2.astype(object), nb2.astype(object)
        D = A @ Bm.T
        ok = (D > 0) & (D * D * 10000 >= t2_e4 * np.outer(na2, nb2))
        ai = asub["vec_id"].to_numpy(dtype=np.int64)
        bi = bsub["vec_id"].to_numpy(dtype=np.int64)
        ii, jj = np.nonzero(ok)
        x, y, d = ai[ii], bi[jj], D[ii, jj].astype(np.int64)
        keep = x != y
        if key[-2] == key[-1]:  # diagonal: both sides are the same rows
            keep = x < y
        x, y, d = x[keep], y[keep], d[keep]
        return pd.DataFrame(
            {"a_id": np.minimum(x, y), "b_id": np.maximum(x, y), "dot": d}
        )

    return both.groupBy(*key_cols, "ka", "kb").applyInPandas(
        matmul, "a_id bigint, b_id bigint, dot bigint"
    )


def brute_force_topk(
    emb: DataFrame, query: DataFrame, k: int = 20, vec_col: str = "embedding"
) -> DataFrame:
    """Top-k by quantized dot product against a single-row query
    DataFrame (column `q`).  Output: vec_id, dot_q — exact integers."""
    q = F.broadcast(query.select(_quantized(F.col("q")).alias("_q")))
    scored = emb.crossJoin(q).select(
        "vec_id",
        _dot(_quantized(F.col(vec_col)), F.col("_q")).alias("dot_q"),
    )
    return scored.orderBy(F.col("dot_q").desc(), F.col("vec_id")).limit(k)


def srp_bucket(emb: DataFrame, planes: int = 8, vec_col: str = "embedding") -> DataFrame:
    """Sign-random-projection bucket id per vector (the LSH scale path).

    Plane p's normal is the deterministic ±1 pattern from bit p of the
    dimension index hash — portable arithmetic, no RNG state.
    Output: vec_id, bucket (int).
    """
    # quantize once per row, derive every plane's projection from the
    # materialized q array (the per-plane form re-ran the quantize
    # transform `planes` times per row)
    return emb.select(
        "vec_id", _quantized(F.col(vec_col)).alias("_q")
    ).select(
        "vec_id", _srp_bucket_from_q(F.col("_q"), planes).alias("bucket")
    )


def cosine_near_dup(
    emb: DataFrame, threshold_e2: int = 30, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — exact all-pairs form.

    Emits (a_id, b_id, dot) for every pair with cosine similarity ≥
    threshold_e2/100, decided in EXACT integer arithmetic so the DuckDB
    oracle replays it bit-for-bit:

        dot > 0  ∧  dot² · 10⁴ ≥ threshold_e2² · |a|² · |b|²

    over e3-quantized vectors (cosine ≥ t ⟺ dot²·1e4 ≥ (t·100)²·na²·nb²
    for positive dot; all terms ≤ ~1.6e17 for 64-dim unit-scale vectors,
    well inside bigint).

    The build side is broadcast: at probe-corpus scale this operator is
    for correctness and re-ranking; the 10^10-vector path is
    :func:`cosine_near_dup_lsh`, which makes the pair join bucket-local.
    """
    q = emb.select("vec_id", _quantized(F.col(vec_col)).alias("q"))
    q = q.withColumn("n2", _dot(F.col("q"), F.col("q")))
    a = q.select(
        F.col("vec_id").alias("a_id"), F.col("q").alias("_qa"),
        F.col("n2").alias("_na2"),
    )
    b = q.select(
        F.col("vec_id").alias("b_id"), F.col("q").alias("_qb"),
        F.col("n2").alias("_nb2"),
    )
    t2_e4 = threshold_e2 * threshold_e2
    return (
        a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
        .withColumn("dot", _dot(F.col("_qa"), F.col("_qb")))
        .filter(
            (F.col("dot") > 0)
            & (
                F.col("dot") * F.col("dot") * F.lit(10000)
                >= F.lit(t2_e4) * F.col("_na2") * F.col("_nb2")
            )
        )
        .select("a_id", "b_id", "dot")
    )


def cosine_near_dup_block(
    emb: DataFrame, threshold_e2: int = 30, num_blocks: int = 16,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs near-dup via BLOCK MATMUL — same output as
    :func:`cosine_near_dup`, viable cost.

    The naive form is a broadcast nested loop paying an interpreted
    64-dim ``zip_with``+``aggregate`` per pair (O(n²) engine-side dots).
    Here vectors hash into ``num_blocks`` blocks; each row is replicated
    to its block's pairings (n·(B+1) tiny rows through one shuffle) and
    each (block_a, block_b) group computes all its dots as ONE NumPy
    int64 matrix product.  Exactness is preserved: e3-quantized int64
    arithmetic end-to-end, with an object-dtype (arbitrary-precision)
    fallback whenever quantized norms are large enough that the
    ``dot²·10⁴`` / ``t²·|a|²·|b|²`` comparison could exceed int64 —
    the naive SQL form would silently wrap there (non-ANSI); this form
    stays correct at any input scale.

    At 10^10 vectors all-pairs is not a thing anyway —
    :func:`cosine_near_dup_lsh` restricts pairs to SRP buckets; this
    operator is the exact verifier/re-ranker at corpus-sample scale.
    """
    t2_e4 = threshold_e2 * threshold_e2
    q = _fan_out(emb.select("vec_id", vec_col)).select(
        "vec_id", _quantized(F.col(vec_col)).alias("q")
    ).withColumn("n2", _dot(F.col("q"), F.col("q")))
    return _block_matmul_pairs(q, t2_e4, num_blocks, key_cols=[])


def cosine_near_dup_lsh(
    emb: DataFrame, threshold_e2: int = 30, planes: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup scale path: SRP-bucket both sides, pair only within a
    bucket (high-cosine pairs agree on sign projections with high
    probability), then apply the exact integer cosine test.

    The pair join becomes an equi join on `bucket` — shuffle volume is
    O(sum of bucket sizes squared / #buckets), partition-local after the
    bucket shuffle, instead of an O(n²) broadcast nested loop.  Recall
    is tunable via `planes` (fewer planes → bigger buckets → higher
    recall); results are always a subset of :func:`cosine_near_dup`.

    INPUT-SCALE CONTRACT: the integer test ``dot²·10⁴ ≥ t²·|a|²·|b|²``
    assumes e3-quantized norms ≤ ~3e5 per side (any unit-scale
    embedding); beyond that the bigint product can wrap silently in
    non-ANSI Spark.  For arbitrary-scale inputs use
    :func:`cosine_near_dup_block`, whose kernel detects the bound and
    switches to arbitrary-precision arithmetic.
    """
    # bucket computed INLINE from the quantized vector (the join-back
    # on vec_id scanned the table twice and shuffled it for nothing),
    # then all-pairs WITHIN each bucket via the same NumPy int64 block
    # matmul as :func:`cosine_near_dup_block` — the bucket join's old
    # SortMergeJoin evaluated the interpreted 64-element
    # zip_with+aggregate dot product 4x per candidate pair (join
    # condition 3x + final projection), ~10^9 lambda evaluations at a
    # 20k-vector corpus.  Sub-blocking within the bucket keeps any one
    # task's pair matrix bounded regardless of bucket skew.  The matmul
    # kernel also upgrades the overflow contract: norms past the int64
    # bound take the arbitrary-precision path instead of wrapping.
    t2_e4 = threshold_e2 * threshold_e2
    q = _fan_out(emb.select("vec_id", vec_col)).select(
        "vec_id", _quantized(F.col(vec_col)).alias("q")
    ).select(
        "vec_id", "q", _srp_bucket_from_q(F.col("q"), planes).alias("bucket")
    ).withColumn("n2", _dot(F.col("q"), F.col("q")))
    return _block_matmul_pairs(
        q, t2_e4, num_blocks=8, key_cols=["bucket"]
    )


def bucketed_topk(
    emb: DataFrame, query: DataFrame, k: int = 20, planes: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict brute force to the probe's SRP bucket."""
    # bucket computed inline (the join-back on vec_id scanned emb twice
    # and paid a join for a value derivable from the row itself)
    qb = srp_bucket(
        query.select(F.lit(-1).alias("vec_id"), F.col("q").alias(vec_col)),
        planes,
        vec_col,
    ).select(F.col("bucket").alias("_qb"))
    cands = _fan_out(emb).withColumn(
        "bucket",
        _srp_bucket_from_q(_quantized(F.col(vec_col)), planes),
    ).join(F.broadcast(qb), F.col("bucket") == F.col("_qb"))
    return brute_force_topk(cands, query, k, vec_col)
