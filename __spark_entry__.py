"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship frontier-pipeline query on sf0.001;
``queries()`` exposes each implemented operator from SURVEY.md §2 (plus
the training-data operators) as standalone DataFrame queries over the
driver's parquet tables; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for every SQL-expressible query.  Column names/types are
aligned pairwise; floats are quantized to integers before aggregation
so value hashes are engine-exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: the crawl wave's core — canonicalize → dedup → per-host
# politeness schedule — over a frontier synthesized from the events table
# ---------------------------------------------------------------------------

def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawlspark.functions.udfs import make_canonicalize_udf
    from crawlspark.config import NormalizationFlags

    canon = make_canonicalize_udf(NormalizationFlags.all_greedy())
    ev = _t(spark, sf_dir, "events")
    raw = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.concat(
            F.lit("HTTPS://WWW.Host"),
            (F.col("user_id") % 50).cast("string"),
            F.lit(".Example:443/a/../p"),
            F.col("event_id").cast("string"),
            F.lit(".html?b=2&a=1#f"),
        ).alias("url"),
        F.greatest(F.round(F.col("value") * 10).cast("bigint"), F.lit(1)).alias(
            "delay_ms"
        ),
    )
    # small parquet inputs arrive as ONE split; fan rows out before the
    # canonicalize UDF so it uses every core (explicit numPartitions is
    # exempt from AQE re-coalescing)
    raw = raw.repartition(spark.sparkContext.defaultParallelism)
    c = raw.withColumn("_c", canon(F.col("url"))).select(
        "event_id", "ts", "delay_ms",
        F.col("_c.url_norm").alias("url_norm"),
        F.col("_c.host").alias("host"),
    )
    # URL-seen dedup (first occurrence wins), then the politeness schedule:
    # virtual-time exclusive cumsum per host — the engine's signature op
    w_dup = Window.partitionBy("url_norm").orderBy("ts", "event_id")
    frontier = c.withColumn("_rn", F.row_number().over(w_dup)).filter(
        F.col("_rn") == 1
    )
    w_host = Window.partitionBy("host").orderBy("ts", "event_id")
    return frontier.select(
        "url_norm",
        "host",
        F.row_number().over(w_host).alias("seq"),
        F.coalesce(
            F.sum("delay_ms").over(w_host.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("sched_ms"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# relational re-expressions of the crawl operators (SURVEY §2)
# ---------------------------------------------------------------------------

def _q_seen_anti_join(spark, sf):
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").select("l_orderkey").distinct()
    return orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"], "left_anti"
    ).select("o_orderkey")


def _q_frontier_dedup(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_orderkey", "l_partkey").agg(
        F.min("l_linenumber").alias("first_line")
    )


def _q_politeness_schedule(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delay = F.round(F.col("value") * 100).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(
            F.sum(delay).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).alias("sched_ms"),
    )


def _q_harvest_explode(spark, sf):
    docs = _t(spark, sf, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_group_agg_pricing(spark, sf):
    li = _t(spark, sf, "lineitem")
    q = F.round(F.col("l_quantity") * 100).cast("bigint")
    p = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(q).alias("sum_qty_e2"),
        F.sum(p).alias("sum_price_e2"),
        F.count(F.lit(1)).alias("cnt"),
    )


def _q_seed_host_semi_join(spark, sf):
    region = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    asia_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi"
    )
    return cust.join(
        F.broadcast(asia_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey")


def _q_topk_per_host(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("bigint").alias("value_e2"),
            "rn",
        )
    )


def _q_asof_latest(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("last_event_id"), F.col("ts").alias("last_ts"))
    )


def _q_maxvisits_limit(spark, sf):
    return (
        _t(spark, sf, "orders")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_orderdate")
    )


def _q_url_canonicalize(spark, sf):
    from crawlspark.functions.udfs import make_canonicalize_udf
    from crawlspark.config import NormalizationFlags

    canon = make_canonicalize_udf(NormalizationFlags.all_greedy())
    ev = _t(spark, sf, "events")
    raw = F.concat(
        F.lit("HTTPS://WWW.Host"),
        (F.col("user_id") % 50).cast("string"),
        F.lit(".Example:443/a/../p"),
        F.col("event_id").cast("string"),
        F.lit(".html?b=2&a=1#f"),
    )
    return ev.select(
        "event_id", canon(raw).getField("url_norm").alias("url_norm")
    )


def _q_robots_gate(spark, sf):
    from crawlspark.functions.udfs import make_robots_parse_udf, robots_allowed_udf
    from crawlspark.config import DEFAULT_ROBOT_USER_AGENT

    parse = make_robots_parse_udf(DEFAULT_ROBOT_USER_AGENT)
    ev = _t(spark, sf, "events").select(
        "event_id", (F.col("user_id") % 50).cast("int").alias("host_id")
    )
    hosts = ev.select("host_id").distinct().withColumn(
        "body",
        F.when(
            F.col("host_id") % 2 == 1,
            F.lit("User-agent: *\nDisallow: /e"),
        ).otherwise(F.lit("")).cast("binary"),
    )
    rules = hosts.select(
        "host_id",
        parse(F.lit(200), F.col("body")).getField("rules_json").alias("rules_json"),
    )
    frontier = ev.withColumn(
        "path", F.concat(F.lit("/e"), F.col("event_id").cast("string"))
    )
    return frontier.join(F.broadcast(rules), "host_id").select(
        "event_id",
        "host_id",
        robots_allowed_udf(F.col("rules_json"), F.col("path")).alias("allowed"),
    )


# ---------------------------------------------------------------------------
# training-data operators (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------

def _q_dedup_exact(spark, sf):
    from crawlspark.operators.textops import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf, "documents"))


def _q_dedup_minhash(spark, sf):
    from crawlspark.operators.textops import minhash_signatures

    return minhash_signatures(_t(spark, sf, "documents"))


def _q_lsh_pairs(spark, sf):
    from crawlspark.operators.textops import lsh_candidate_pairs

    return lsh_candidate_pairs(_t(spark, sf, "documents"))


def _q_ngram_jaccard(spark, sf):
    from crawlspark.operators.textops import ngram_jaccard

    return ngram_jaccard(_t(spark, sf, "documents"))


def _q_media_features(spark, sf):
    # deterministic media synthesis (real BMP/WAV/CVID bytes, born on
    # executors) -> real decode kernels; every projected feature is
    # integer arithmetic the DuckDB oracle re-derives from doc_id
    from crawlspark.functions.multimodal import (
        extract_media_features,
        media_from_ids,
    )

    media = media_from_ids(_t(spark, sf, "documents").select("doc_id"))
    return extract_media_features(media, frame_stride_ms=200).select(
        "media_id", "kind", "width", "height", "duration_ms", "mean_e6",
        "frames_sampled",
    )


def _q_dedup_pipeline(spark, sf):
    # shingle+signature pass computed ONCE, shared by LSH banding and
    # the exact Jaccard verifier (vs 3x recompute as separate queries)
    from crawlspark.operators.textops import dedup_pipeline

    return dedup_pipeline(_t(spark, sf, "documents"))


def _q_dedup_clusters(spark, sf):
    # pair graph -> duplicate CLUSTERS: LSH pairs verified by exact
    # Jaccard, resolved into connected components (min-label
    # propagation + pointer jumping), one keeper per cluster
    from crawlspark.operators.components import dedup_clusters

    return dedup_clusters(_t(spark, sf, "documents"))


def _q_simhash(spark, sf):
    from crawlspark.operators.textops import simhash16

    return simhash16(_t(spark, sf, "documents"))


def _q_lang_id(spark, sf):
    from crawlspark.operators.textops import language_score

    return language_score(_t(spark, sf, "documents"))


def _q_quality_score(spark, sf):
    from crawlspark.operators.textops import quality_score

    return quality_score(_t(spark, sf, "documents"))


def _q_token_count(spark, sf):
    from crawlspark.operators.textops import token_counts

    return token_counts(_t(spark, sf, "documents"))


def _q_lang_id_trigram(spark, sf):
    from crawlspark.functions.langid import lang_id_trigram

    return lang_id_trigram(_t(spark, sf, "documents"))


def _q_token_count_bpe(spark, sf):
    from crawlspark.operators.textops import token_counts_bpe

    return token_counts_bpe(_t(spark, sf, "documents"))


def _q_doc_fingerprint(spark, sf):
    from crawlspark.operators.textops import doc_fingerprint

    return doc_fingerprint(_t(spark, sf, "documents"))


def _q_embedding_topk(spark, sf):
    from crawlspark.operators.similarity import brute_force_topk

    emb = _t(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return brute_force_topk(emb, query, k=20)


def _q_embedding_ann_bucketed(spark, sf):
    from crawlspark.operators.similarity import bucketed_topk

    emb = _t(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return bucketed_topk(emb, query, k=10)


def _q_embedding_near_dup(spark, sf):
    # exact all-pairs via block matmul (NumPy int64 in applyInPandas) —
    # same integer semantics as the naive zip_with form, ~10x cheaper
    from crawlspark.operators.similarity import cosine_near_dup_block

    return cosine_near_dup_block(_t(spark, sf, "embeddings"), threshold_e2=30)


def _q_embedding_near_dup_lsh(spark, sf):
    from crawlspark.operators.similarity import cosine_near_dup_lsh

    return cosine_near_dup_lsh(
        _t(spark, sf, "embeddings"), threshold_e2=30, planes=4
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_schedule": _flagship,
        "seen_anti_join": _q_seen_anti_join,
        "frontier_dedup": _q_frontier_dedup,
        "politeness_schedule": _q_politeness_schedule,
        "harvest_explode": _q_harvest_explode,
        "group_agg_pricing": _q_group_agg_pricing,
        "seed_host_semi_join": _q_seed_host_semi_join,
        "topk_per_host": _q_topk_per_host,
        "asof_latest": _q_asof_latest,
        "maxvisits_limit": _q_maxvisits_limit,
        "url_canonicalize": _q_url_canonicalize,
        "robots_gate": _q_robots_gate,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash": _q_dedup_minhash,
        "lsh_pairs": _q_lsh_pairs,
        "ngram_jaccard": _q_ngram_jaccard,
        "dedup_pipeline": _q_dedup_pipeline,
        "dedup_clusters": _q_dedup_clusters,
        "media_features": _q_media_features,
        "simhash": _q_simhash,
        "lang_id": _q_lang_id,
        "quality_score": _q_quality_score,
        "lang_id_trigram": _q_lang_id_trigram,
        "token_count": _q_token_count,
        "token_count_bpe": _q_token_count_bpe,
        "doc_fingerprint": _q_doc_fingerprint,
        "embedding_topk": _q_embedding_topk,
        "embedding_ann_bucketed": _q_embedding_ann_bucketed,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_SHINGLES_CTE = """
w AS (SELECT doc_id, text, string_split(lower(text),' ') AS ws FROM documents),
sh AS (
  SELECT doc_id, unnest(list_transform(range(0, greatest(len(ws)-2,0)),
         i -> array_to_string(ws[i+1:i+3],' '))) AS shingle
  FROM w
)
"""

_SIGS_CTE = _SHINGLES_CTE + """,
sigs AS (
  SELECT doc_id,
         MIN(md5('0|'||shingle)) AS sig_0,
         MIN(md5('1|'||shingle)) AS sig_1,
         MIN(md5('2|'||shingle)) AS sig_2,
         MIN(md5('3|'||shingle)) AS sig_3
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT doc_id, 0 AS band, sig_0||'|'||sig_1 AS key FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band, sig_2||'|'||sig_3 AS key FROM sigs
),
pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.band AS band
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
"""


def _lang_id_trigram_sql() -> str:
    from crawlspark.functions.langid import profiles_values_sql

    return f"""
WITH tris AS (
  SELECT doc_id, unnest(list_transform(
           range(0, greatest(length(lower(text)) - 2, 0)),
           i -> substr(lower(text), CAST(i + 1 AS INTEGER), 3))) AS tg
  FROM documents
),
counts AS (
  SELECT doc_id, lang, COUNT(*) AS score
  FROM tris JOIN {profiles_values_sql()} USING (tg)
  GROUP BY doc_id, lang
),
best AS (
  SELECT doc_id, lang, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM counts
)
SELECT d.doc_id,
       COALESCE(b.lang, 'und') AS lang,
       CAST(COALESCE(b.score, 0) AS BIGINT) AS score
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON b.doc_id = d.doc_id
"""


def _token_count_bpe_sql() -> str:
    from crawlspark.functions.bpe import fixture_merges, merge_replace_sql

    wrapped = r"regexp_replace(w, '(.)', '§\1§', 'g')"
    merged = merge_replace_sql(wrapped, fixture_merges())
    return f"""
SELECT doc_id,
       CAST(coalesce(list_sum(list_transform(
           list_filter(string_split(replace(lower(text), '§', ''), ' '),
                       w -> w <> ''),
           w -> (length({merged}) - length(replace({merged}, '§', ''))) // 2
       )), 0) AS BIGINT) AS bpe_tokens,
       CAST(len(regexp_extract_all(text,'\\w+|[^\\w\\s]')) AS BIGINT) AS re_tokens
FROM documents
"""


def _simhash_sql() -> str:
    vs = ",\n".join(
        f"SUM(CASE WHEN instr('89abcdef', substr(h,{i + 1},1))>0 THEN 1 ELSE -1 END) AS v_{i}"
        for i in range(16)
    )
    bits = " + ".join(
        f"(CASE WHEN v_{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, md5(unnest(string_split(lower(text),' '))) AS h FROM documents
),
agg AS (SELECT doc_id, {vs} FROM tok GROUP BY doc_id)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM agg
"""


def _srp_bucket_sql(q: str, planes: int) -> str:
    """DuckDB replay of operators/similarity.srp_bucket: plane p's ±1
    sign for 0-based dim i is bit (16+p) of the Knuth multiplicative
    hash of i; bucket = Σ_p (proj_p > 0) << p.  Spark's bigint cast of
    the double division truncates; all operands are positive so
    floor() reproduces it exactly."""
    bits = []
    for p in range(planes):
        shift = 1 << (16 + p)
        proj = (
            f"list_sum(list_transform(range(1, len({q})+1), j -> "
            f"CASE WHEN CAST(floor(((j-1)*2654435761)/{shift}.0) AS BIGINT)"
            f" % 2 = 0 THEN {q}[j] ELSE -{q}[j] END))"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


_QUANT_E = """
e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
  FROM embeddings
)
"""


_STOP_SQL = " + ".join(
    f"len(regexp_extract_all(text, '\\b{wrd}\\b'))"
    for wrd in ["the", "and", "of", "to", "in"]
)


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_schedule": """
WITH raw AS (
  SELECT event_id, ts,
         'http://host' || CAST(user_id % 50 AS VARCHAR) || '.example/p'
           || CAST(event_id AS VARCHAR) || '.html?a=1&b=2' AS url_norm,
         'host' || CAST(user_id % 50 AS VARCHAR) || '.example' AS host,
         greatest(CAST(round(value*10) AS BIGINT), 1) AS delay_ms
  FROM events
),
ded AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY url_norm ORDER BY ts, event_id) AS rn
  FROM raw
)
SELECT url_norm, host,
       CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY ts, event_id) AS INTEGER) AS seq,
       CAST(COALESCE(SUM(delay_ms) OVER (PARTITION BY host ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sched_ms
FROM ded WHERE rn = 1
""",
        "seen_anti_join": """
SELECT o_orderkey FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
        "frontier_dedup": """
SELECT l_orderkey, l_partkey, MIN(l_linenumber) AS first_line
FROM lineitem GROUP BY l_orderkey, l_partkey
""",
        "politeness_schedule": """
SELECT event_id, user_id,
       CAST(COALESCE(SUM(CAST(round(value*100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sched_ms
FROM events
""",
        "harvest_explode": """
SELECT token, COUNT(*) AS n FROM (
  SELECT unnest(string_split(text,' ')) AS token FROM documents
) GROUP BY token
""",
        "group_agg_pricing": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_e2,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_e2,
       COUNT(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "seed_host_semi_join": """
SELECT c_custkey FROM customer c
WHERE EXISTS (
  SELECT 1 FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA' AND n.n_nationkey = c.c_nationkey
)
""",
        "topk_per_host": """
SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) AS value_e2, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
""",
        "asof_latest": """
SELECT user_id, event_id AS last_event_id, ts AS last_ts FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
        "maxvisits_limit": """
SELECT o_orderkey, o_orderdate FROM orders
ORDER BY o_orderdate, o_orderkey LIMIT 100
""",
        "url_canonicalize": """
SELECT event_id,
       'http://host' || CAST(user_id % 50 AS VARCHAR) || '.example/p'
         || CAST(event_id AS VARCHAR) || '.html?a=1&b=2' AS url_norm
FROM events
""",
        "robots_gate": """
SELECT event_id, CAST(user_id % 50 AS INTEGER) AS host_id,
       (user_id % 50) % 2 = 0 AS allowed
FROM events
""",
        "dedup_exact": """
SELECT md5(text) AS content_hash, MIN(doc_id) AS rep_doc_id, COUNT(*) AS dup_count
FROM documents GROUP BY md5(text)
""",
        "dedup_minhash": "WITH " + _SHINGLES_CTE + """
SELECT doc_id,
       MIN(md5('0|'||shingle)) AS sig_0,
       MIN(md5('1|'||shingle)) AS sig_1,
       MIN(md5('2|'||shingle)) AS sig_2,
       MIN(md5('3|'||shingle)) AS sig_3
FROM sh GROUP BY doc_id
""",
        "lsh_pairs": "WITH " + _SIGS_CTE + "SELECT a_id, b_id, band FROM pairs",
        "ngram_jaccard": "WITH " + _SIGS_CTE + """,
p2 AS (SELECT DISTINCT a_id, b_id FROM pairs),
dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
  SELECT p2.a_id, p2.b_id, COUNT(*) AS n_common
  FROM p2
  JOIN dsh a ON a.doc_id = p2.a_id
  JOIN dsh b ON b.doc_id = p2.b_id AND b.shingle = a.shingle
  GROUP BY p2.a_id, p2.b_id
)
SELECT i.a_id, i.b_id,
       CAST(floor(10000.0 * n_common / (sa.n_sh + sb.n_sh - n_common)) AS BIGINT) AS jaccard_e4
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a_id
JOIN sizes sb ON sb.doc_id = i.b_id
""",
        # replay the media generator's integer formulas per doc_id
        # (crawlspark/functions/multimodal.py _media_params /
        # synthesize_media_blob): the Spark side encodes REAL BMP/WAV/
        # CVID bytes and decodes them; matching means the codec
        # round-trip is bit-faithful
        "media_features": """
WITH ids AS (SELECT doc_id AS mid FROM documents),
img AS (
  SELECT mid, 'image' AS kind,
         CAST(8 + mid % 8 AS INTEGER) AS width,
         CAST(6 + mid % 5 AS INTEGER) AS height,
         0 AS duration_ms,
         list_sum(list_transform(range(0, (8 + mid % 8) * (6 + mid % 5)),
                  i -> (mid * 31 + i * 7) % 256)) AS s,
         (8 + mid % 8) * (6 + mid % 5) AS n,
         1 AS frames_sampled,
         255 AS scale
  FROM ids WHERE mid % 3 = 0
),
aud AS (
  SELECT mid, 'audio' AS kind, 0 AS width, 0 AS height,
         (200 + mid % 50) * 1000 // 8000 AS duration_ms,
         list_sum(list_transform(range(0, 200 + mid % 50),
                  i -> abs(((mid * 7 + i * 13) % 65536) - 32768))) AS s,
         200 + mid % 50 AS n,
         0 AS frames_sampled,
         32768 AS scale
  FROM ids WHERE mid % 3 = 1
),
vid AS (
  SELECT mid, 'video' AS kind,
         CAST(8 + mid % 4 AS INTEGER) AS width, 8 AS height,
         (5 + mid % 6) * 1000 // 10 AS duration_ms,
         list_sum(list_transform(range(0, (5 + mid % 6 + 1) // 2),
            j -> list_sum(list_transform(range(0, (8 + mid % 4) * 8),
                 i -> (mid * 17 + 2 * j * 101 + i * 3) % 256)))) AS s,
         ((5 + mid % 6 + 1) // 2) * (8 + mid % 4) * 8 AS n,
         (5 + mid % 6 + 1) // 2 AS frames_sampled,
         255 AS scale
  FROM ids WHERE mid % 3 = 2
),
allm AS (SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid)
SELECT mid AS media_id, kind, width, height,
       CAST(duration_ms AS INTEGER) AS duration_ms,
       CAST(s * 1000000 // (n * scale) AS BIGINT) AS mean_e6,
       CAST(frames_sampled AS INTEGER) AS frames_sampled
FROM allm
""",
        "dedup_pipeline": "WITH " + _SIGS_CTE + """,
nb AS (SELECT a_id, b_id, COUNT(*) AS n_bands FROM pairs GROUP BY a_id, b_id),
p2 AS (SELECT DISTINCT a_id, b_id FROM pairs),
dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
  SELECT p2.a_id, p2.b_id, COUNT(*) AS n_common
  FROM p2
  JOIN dsh a ON a.doc_id = p2.a_id
  JOIN dsh b ON b.doc_id = p2.b_id AND b.shingle = a.shingle
  GROUP BY p2.a_id, p2.b_id
)
SELECT i.a_id, i.b_id, nb.n_bands,
       CAST(floor(10000.0 * n_common / (sa.n_sh + sb.n_sh - n_common)) AS BIGINT) AS jaccard_e4
FROM inter i
JOIN nb ON nb.a_id = i.a_id AND nb.b_id = i.b_id
JOIN sizes sa ON sa.doc_id = i.a_id
JOIN sizes sb ON sb.doc_id = i.b_id
""",
        # near-dup cluster resolution: the recursive CTE computes each
        # node's full reachable set over the verified pair graph and
        # labels it with the minimum reachable id — the declarative
        # fixpoint equivalent of the Spark side's min-label propagation
        "dedup_clusters": "WITH RECURSIVE " + _SIGS_CTE + """,
p2 AS (SELECT DISTINCT a_id, b_id FROM pairs),
dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
  SELECT p2.a_id, p2.b_id, COUNT(*) AS n_common
  FROM p2
  JOIN dsh a ON a.doc_id = p2.a_id
  JOIN dsh b ON b.doc_id = p2.b_id AND b.shingle = a.shingle
  GROUP BY p2.a_id, p2.b_id
),
jac AS (
  SELECT i.a_id, i.b_id,
         CAST(floor(10000.0 * n_common / (sa.n_sh + sb.n_sh - n_common)) AS BIGINT) AS jaccard_e4
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.a_id
  JOIN sizes sb ON sb.doc_id = i.b_id
),
fpairs AS (SELECT a_id, b_id FROM jac WHERE jaccard_e4 >= 3000),
nodes AS (SELECT a_id AS id FROM fpairs UNION SELECT b_id FROM fpairs),
edges AS (SELECT a_id AS u, b_id AS v FROM fpairs
          UNION SELECT b_id, a_id FROM fpairs),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
),
cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id)
SELECT cc.id AS doc_id, cc.cluster_id, sz.cluster_size,
       cc.id = cc.cluster_id AS is_keeper
FROM cc JOIN sz ON sz.cluster_id = cc.cluster_id
""",
        "simhash": _simhash_sql(),
        "lang_id": f"""
SELECT doc_id, CAST({_STOP_SQL} AS BIGINT) AS en_hits,
       ({_STOP_SQL}) >= 2 AS is_en
FROM documents
""",
        "quality_score": f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_c,
       CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
       CAST(length(text) - length(regexp_replace(text,'[.,!?;:]','','g')) AS BIGINT) AS n_punct,
       CAST(floor(10000.0 * ({_STOP_SQL}) / len(string_split(text,' '))) AS BIGINT) AS stop_ratio_e4,
       CAST(floor(10000.0 * length(text) / len(string_split(text,' '))) AS BIGINT) AS chars_per_word_e4
FROM documents
""",
        "token_count": """
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text),' +')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text,'\\w+|[^\\w\\s]')) AS BIGINT) AS re_tokens
FROM documents
""",
        # replay the pinned BPE merge list as nested replace() calls
        # over the delimiter-wrapped word form (functions/bpe.py:
        # delimiter-per-symbol makes plain left-to-right replace
        # reproduce the canonical merge scan exactly)
        "token_count_bpe": _token_count_bpe_sql(),
        "lang_id_trigram": _lang_id_trigram_sql(),
        "doc_fingerprint": "WITH " + _SHINGLES_CTE + """,
fps AS (SELECT doc_id, MIN(md5(shingle)) AS fp FROM (
  SELECT doc_id, unnest(list_transform(range(0, greatest(len(ws)-3,0)),
         i -> array_to_string(ws[i+1:i+4],' '))) AS shingle FROM w
) GROUP BY doc_id)
SELECT w.doc_id, COALESCE(fps.fp, md5(w.text)) AS fingerprint
FROM w LEFT JOIN fps ON fps.doc_id = w.doc_id
""",
        "embedding_topk": """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qx AS (SELECT unnest(e) AS v, generate_subscripts(e,1) AS p FROM q),
ex AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding,1) AS p FROM embeddings)
SELECT ex.vec_id,
       CAST(SUM(CAST(round(CAST(ex.v AS DOUBLE)*1000) AS BIGINT)
         * CAST(round(CAST(qx.v AS DOUBLE)*1000) AS BIGINT)) AS BIGINT) AS dot_q
FROM ex JOIN qx ON ex.p = qx.p
GROUP BY ex.vec_id
ORDER BY dot_q DESC, vec_id LIMIT 20
""",
        "embedding_near_dup": "WITH " + _QUANT_E + """,
n AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS n2
  FROM e
),
p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(list_sum(list_transform(range(1, len(a.q)+1),
              i -> a.q[i]*b.q[i])) AS BIGINT) AS dot,
         a.n2 AS na2, b.n2 AS nb2
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, dot FROM p
WHERE dot > 0 AND dot*dot*10000 >= 900 * na2 * nb2
""",
        "embedding_near_dup_lsh": "WITH " + _QUANT_E + f""",
n AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS n2,
         {_srp_bucket_sql('q', 4)} AS bucket
  FROM e
),
p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(list_sum(list_transform(range(1, len(a.q)+1),
              i -> a.q[i]*b.q[i])) AS BIGINT) AS dot,
         a.n2 AS na2, b.n2 AS nb2
  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT a_id, b_id, dot FROM p
WHERE dot > 0 AND dot*dot*10000 >= 900 * na2 * nb2
""",
        "embedding_ann_bucketed": "WITH " + _QUANT_E + f""",
n AS (
  SELECT vec_id, q, {_srp_bucket_sql('q', 8)} AS bucket FROM e
),
qq AS (SELECT q, bucket FROM n WHERE vec_id = 0)
SELECT n.vec_id,
       CAST(list_sum(list_transform(range(1, len(n.q)+1),
            j -> n.q[j]*qq.q[j])) AS BIGINT) AS dot_q
FROM n, qq
WHERE n.bucket = qq.bucket
ORDER BY dot_q DESC, n.vec_id LIMIT 10
""",
    }
