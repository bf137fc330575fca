"""Round-6 optimization pins: each rewritten operator internal must be
equivalent to its pre-optimization formulation on adversarial inputs
(the oracle tests cover the fixture corpus; these cover the edge shapes
the rewrite could plausibly diverge on)."""

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


EDGE_TEXTS = [
    "",  # no shingles
    "one",  # < n words
    "one two",  # still < n
    "a b c",  # exactly one shingle
    "a b c d e f g",  # normal
    "x x x x x x",  # repeated shingles (multiset vs set)
    "Ünï çôdé ÛNÏ ÇÔDÉ mixed Case words here",  # unicode + case
    "a  b   c d",  # empty tokens from repeated spaces
    " leading and trailing ",  # boundary tokens
    "z y x w v u t s r q p o n m l k j i h g f e d c b a",
]


def test_minhash_array_form_matches_explode_groupby(spark):
    """minhash_signatures (per-row array_min fold) must be row-identical
    to the explode+groupBy(min) formulation it replaced."""
    from crawlspark.operators.textops import _shingles, minhash_signatures

    docs = _docs(spark, EDGE_TEXTS * 3)
    new = minhash_signatures(docs)

    sh = docs.select(
        "doc_id", F.explode(_shingles("text", 3)).alias("shingle")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}|"), F.col("shingle")))).alias(f"sig_{k}")
        for k in range(4)
    ]
    ref = sh.groupBy("doc_id").agg(*aggs)

    got = {tuple(r) for r in new.collect()}
    want = {tuple(r) for r in ref.collect()}
    assert got == want


def test_lsh_matmul_matches_pairwise_join_form(spark):
    """cosine_near_dup_lsh (bucket-local NumPy block matmul) must emit
    the exact (a_id, b_id, dot) set of the per-pair join formulation it
    replaced — including under bucket skew (near-identical vectors all
    landing in one bucket)."""
    from crawlspark.operators.similarity import (
        _dot,
        _quantized,
        cosine_near_dup_lsh,
        srp_bucket,
    )

    # deterministic vectors: a skewed cluster of near-duplicates plus
    # a spread of unrelated ones
    rows = []
    dim = 16
    for i in range(60):
        if i < 25:  # one hot bucket: tiny perturbations of one vector
            vec = [0.5 + ((i * 7 + j) % 5) * 1e-3 for j in range(dim)]
        else:
            vec = [(((i + 1) * (j + 3)) % 11 - 5) / 7.0 for j in range(dim)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    new = {tuple(r) for r in cosine_near_dup_lsh(emb, 30, planes=4).collect()}

    # reference: the old bucket-join + per-pair interpreted dot form
    buckets = srp_bucket(emb, 4)
    q = (
        emb.join(buckets, "vec_id")
        .select("vec_id", "bucket", _quantized(F.col("embedding")).alias("q"))
        .withColumn("n2", _dot(F.col("q"), F.col("q")))
    )
    a = q.select(
        "bucket", F.col("vec_id").alias("a_id"), F.col("q").alias("_qa"),
        F.col("n2").alias("_na2"),
    )
    b = q.select(
        "bucket", F.col("vec_id").alias("b_id"), F.col("q").alias("_qb"),
        F.col("n2").alias("_nb2"),
    )
    ref = {
        tuple(r)
        for r in (
            a.join(b, on="bucket")
            .filter(F.col("a_id") < F.col("b_id"))
            .withColumn("dot", _dot(F.col("_qa"), F.col("_qb")))
            .filter(
                (F.col("dot") > 0)
                & (
                    F.col("dot") * F.col("dot") * F.lit(10000)
                    >= F.lit(900) * F.col("_na2") * F.col("_nb2")
                )
            )
            .select("a_id", "b_id", "dot")
            .collect()
        )
    }
    assert new == ref and len(new) > 0


def test_fan_out_is_conditional(spark):
    """fan_out only repartitions when the input carries fewer
    partitions than the executor parallelism — identity otherwise (at
    scale a multi-split table must NOT gain a corpus-wide shuffle)."""
    from crawlspark.util import fan_out

    p = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(1,)], "x int").coalesce(1)
    assert fan_out(narrow).rdd.getNumPartitions() == p

    wide = spark.range(0, 1000, 1, p + 4)
    out = fan_out(wide.toDF("x"))
    assert out.rdd.getNumPartitions() == p + 4  # untouched
