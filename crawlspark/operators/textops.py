"""Training-data text operators over a documents table.

Everything is built from JVM-side ``pyspark.sql.functions`` expressions
(whole-stage codegen, no Python in the hot path) and designed to be
cross-checkable against an ANSI-SQL oracle: hashes via ``md5`` (portable
across engines), floats quantized to integers before aggregation so
results are bit-exact.

Scale notes (100 TB): every operator below is a narrow projection or a
single hash-partitioned aggregation on doc_id — no skew-prone keys; the
LSH band join is the only self-join and its key (band signature) is
uniform by construction of the hash.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ----------------------------------------------------------------- dedup ----


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: one row per distinct text with the
    representative (min doc_id) and the duplicate count."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _fan_out(df: DataFrame) -> DataFrame:
    from crawlspark.util import fan_out

    return fan_out(df)


def _shingles(text_col: str, n: int = 3):
    """Word n-gram shingles as a column expression (lowercased).

    The split array is bound to a lambda variable ONCE per row via a
    single-element transform: referencing ``split(...)`` directly inside
    the per-shingle lambda re-evaluates the split per array element —
    O(words²·chars) character copying per document (the same trap
    functions/langid.py documents for lower(); measured 4-8x on the
    shingle family at sf1.0)."""
    return F.expr(
        f"""
        flatten(transform(array(split(lower({text_col}), ' ')), ws ->
            CASE WHEN size(ws) >= {n}
            THEN transform(
                sequence(0, size(ws) - {n}),
                i -> concat_ws(' ', slice(ws, i + 1, {n}))
            )
            ELSE array()
            END
        ))
        """
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_hashes: int = 4, shingle_n: int = 3
) -> DataFrame:
    """MinHash signatures from word-shingle sets.

    Min-wise hashing with k independent salted md5s (md5 is uniform
    enough and — unlike xxhash — identical across engines, so the
    DuckDB oracle can replay it).  Output: doc_id, sig_0..sig_{k-1}.

    Computed as a per-row ``array_min(transform(...))`` over the
    shingle array — NO explode, NO shuffle: the explode+groupBy form
    paid an Exchange plus two SortAggregates (min over strings has no
    hash-aggregate buffer) over every shingle row for a value each doc
    can fold locally.  Row set is identical: explode drops empty
    shingle arrays, so short docs are filtered here the same way;
    array_min uses the same UTF8 binary ordering as min().
    """
    base = _fan_out(docs.select("doc_id", text_col)).select(
        "doc_id", _shingles(text_col, shingle_n).alias("_sh")
    ).filter(F.size("_sh") > 0)
    sigs = [
        F.array_min(
            F.transform(
                F.col("_sh"), lambda s: F.md5(F.concat(F.lit(f"{k}|"), s))
            )
        ).alias(f"sig_{k}")
        for k in range(num_hashes)
    ]
    return base.select("doc_id", *sigs)


def lsh_candidate_pairs(
    docs: DataFrame | None = None, text_col: str = "text",
    num_hashes: int = 4, bands: int = 2, sigs: DataFrame | None = None,
) -> DataFrame:
    """Banded-LSH near-dup candidate pairs (a_id < b_id, band id).

    signature → `bands` bands of `num_hashes/bands` rows → bucket join.
    The band self-join shuffles on the band hash, which is uniform; at
    10^10 docs the join is bucket-local (bucket both sides by band_key).

    Pass precomputed ``sigs`` (from :func:`minhash_signatures`) to avoid
    re-shingling — the signature pass is the expensive stage and a dedup
    pipeline shares it across LSH, verification and reporting.
    """
    if sigs is None:
        sigs = minhash_signatures(docs, text_col, num_hashes)
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + i}") for i in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *parts).alias("key"))
        )
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # ONE deliberate exchange on the join key: both sides of the band
    # self-join sit above this same shuffle, so the signature
    # computation runs once and side b becomes a ReusedExchange.
    # Without it the narrow sig projection (array_min per row — no
    # natural shuffle boundary anymore) is recomputed per join side,
    # or worse re-evaluated to build a broadcast.  The banded rows are
    # doc_id + band + a 2-hash key — metadata-sized relative to the
    # shingle relation this exchange replaced.
    banded = banded.repartition(
        banded.sparkSession.sparkContext.defaultParallelism, "band", "key"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.band").alias("band"),
        )
        .distinct()
    )


def ngram_jaccard(
    docs: DataFrame | None = None, pairs: DataFrame | None = None,
    text_col: str = "text", shingle_n: int = 3,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (from LSH by
    default).  Quantized to e4 integers so the result is engine-exact.
    ``sh``: pre-exploded DISTINCT (doc_id, shingle) rows to share the
    shingling stage across a dedup pipeline."""
    if pairs is None:
        pairs = lsh_candidate_pairs(docs, text_col).select("a_id", "b_id").distinct()
    if sh is None:
        sh = _fan_out(docs.select("doc_id", text_col)).select(
            "doc_id", F.explode(_shingles(text_col, shingle_n)).alias("shingle")
        ).distinct()
    a_sh = sh.select(F.col("doc_id").alias("a_id"), F.col("shingle").alias("a_sh"))
    b_sh = sh.select(F.col("doc_id").alias("b_id"), F.col("shingle").alias("b_sh"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    b_sh = b_sh.withColumnRenamed("b_id", "b_id2")
    inter = (
        pairs.join(a_sh, "a_id")
        .join(
            b_sh,
            (F.col("b_sh") == F.col("a_sh")) & (F.col("b_id2") == F.col("b_id")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "a_n"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "b_n"), "b_id")
        .select(
            "a_id",
            "b_id",
            (
                F.floor(
                    F.lit(10000)
                    * F.col("n_common")
                    / (F.col("a_n") + F.col("b_n") - F.col("n_common"))
                )
            ).cast("bigint").alias("jaccard_e4"),
        )
    )


def dedup_pipeline(
    docs: DataFrame, text_col: str = "text", num_hashes: int = 4,
    bands: int = 2, shingle_n: int = 3, persist: bool = False,
) -> DataFrame:
    """Full near-dup pipeline sharing one shingling pass: shingles →
    MinHash signatures → banded-LSH candidate pairs → exact n-gram
    Jaccard verification, emitting (a_id, b_id, n_bands, jaccard_e4).

    Running the three stages as separate queries re-shingles and
    re-signs the corpus three times; here the exploded shingle relation
    and the signature table are shared subplans of ONE query (Spark's
    exchange reuse dedupes their shuffles; measured faster than
    persisting them, which also pins executor storage with no release
    point inside an operator).  ``persist=True`` caches them instead —
    the caller owns unpersisting via the returned plan's sources.  At
    100 TB the equivalent is materializing the signature table once.
    """
    sh_all = _fan_out(docs.select("doc_id", text_col)).select(
        "doc_id", F.explode(_shingles(text_col, shingle_n)).alias("shingle")
    )
    if persist:
        sh_all = sh_all.persist()
    # signatures fold per row (array_min over the shingle array — see
    # minhash_signatures): cheaper than sharing sh_all's explode, which
    # forced an Exchange + two string SortAggregates per consumer
    sigs = minhash_signatures(docs, text_col, num_hashes, shingle_n)
    if persist:
        sigs = sigs.persist()
    banded_pairs = lsh_candidate_pairs(
        sigs=sigs, num_hashes=num_hashes, bands=bands
    )
    pairs = banded_pairs.select("a_id", "b_id").distinct()
    n_bands = banded_pairs.groupBy("a_id", "b_id").agg(
        F.count(F.lit(1)).alias("n_bands")
    )
    jac = ngram_jaccard(
        pairs=pairs, shingle_n=shingle_n, sh=sh_all.distinct()
    )
    return n_bands.join(jac, on=["a_id", "b_id"]).select(
        "a_id", "b_id", "n_bands", "jaccard_e4"
    )


def simhash16(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """16-bit SimHash over word tokens.

    Bit i of a token's contribution is the high bit of the i-th hex
    nibble of md5(token) (in {'8'..'f'} → +1 else −1); the document bit
    is the sign of the sum.  Entirely portable SQL (md5 + substr), so
    the oracle replays it exactly.
    """
    tok = _fan_out(docs.select("doc_id", text_col)).select(
        "doc_id", F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(
                F.expr(f"instr('89abcdef', substring(h, {i + 1}, 1)) > 0"),
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"v_{i}")
        for i in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(16):
        term = F.when(F.col(f"v_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("bigint").alias("simhash"))


# --------------------------------------------------------------- analysis ----

_STOPWORDS = ["the", "and", "of", "to", "in"]


def language_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language scoring (n-gram-heuristic shape): count of
    English marker words; is_en when ≥ 2 hits."""
    hits = None
    for wrd in _STOPWORDS:
        h = F.size(F.regexp_extract_all(F.col(text_col), F.lit(rf"\b{wrd}\b"), F.lit(0)))
        hits = h if hits is None else hits + h
    return docs.select(
        "doc_id",
        hits.cast("bigint").alias("en_hits"),
        (hits >= 2).alias("is_en"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / word-length quality features,
    integer-quantized (e4) so oracle comparison is exact."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    words = F.split(t, " ")
    n_words = F.size(words)
    stop_hits = None
    for wrd in _STOPWORDS:
        h = F.size(F.regexp_extract_all(t, F.lit(rf"\b{wrd}\b"), F.lit(0)))
        stop_hits = h if stop_hits is None else stop_hits + h
    return docs.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars_c"),
        n_words.cast("bigint").alias("n_words"),
        n_punct.cast("bigint").alias("n_punct"),
        F.floor(F.lit(10000) * stop_hits / n_words).cast("bigint").alias("stop_ratio_e4"),
        F.floor(F.lit(10000) * n_chars / n_words).cast("bigint").alias("chars_per_word_e4"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (\\w+ runs and single
    punctuation marks) per document."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(t), r" +")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"\w+|[^\w\s]"), F.lit(0)))
        .cast("bigint")
        .alias("re_tokens"),
    )


def token_counts_bpe(
    docs: DataFrame, merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Subword token counts from the trained BPE merge list (pinned to
    the fixture corpus by default) alongside the regex count.

    The BPE scan is a per-document Python computation — the legitimate
    Arrow-batched pandas-UDF case (a real tokenizer can't be a Catalyst
    expression); the per-word LRU cache amortizes Zipf-repeated words
    within each batch."""
    from pyspark.sql.functions import pandas_udf

    from crawlspark.functions.bpe import bpe_token_count, fixture_merges

    mt = list(merges) if merges is not None else fixture_merges()

    @pandas_udf("bigint")
    def bpe_count(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda t: bpe_token_count(t, mt))

    t = F.col(text_col)
    docs = _fan_out(docs.select("doc_id", text_col))
    return docs.select(
        "doc_id",
        bpe_count(t).alias("bpe_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"\w+|[^\w\s]"), F.lit(0)))
        .cast("bigint")
        .alias("re_tokens"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", n: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over word n-grams (falls back
    to md5(text) for docs shorter than n words)."""
    sh = _fan_out(docs.select("doc_id", text_col)).select(
        "doc_id", F.col(text_col).alias("_t"), _shingles(text_col, n).alias("g")
    )
    return sh.select(
        "doc_id",
        F.when(F.size("g") > 0, F.array_min(F.transform(F.col("g"), F.md5)))
        .otherwise(F.md5(F.col("_t")))
        .alias("fingerprint"),
    )
