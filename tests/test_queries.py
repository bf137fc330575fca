"""Driver-contract checks: every queries() entry runs, and every
oracle_sql() entry matches the Spark result (row multiset, column-name
aligned) on sf0.001 — a local replica of the driver's DuckDB gate."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def test_all_queries_have_unique_names():
    q = entry_mod.queries()
    assert len(q) >= 20
    missing_oracle = set(q) - set(entry_mod.oracle_sql())
    # every query has a DuckDB oracle (the LSH/ANN bucket arithmetic is
    # replayed in SQL by _srp_bucket_sql)
    assert missing_oracle == set()


def test_near_dup_lsh_subset_of_exact(spark):
    """The SRP-bucketed near-dup scale path returns a (non-trivial)
    subset of the exact all-pairs result at the same threshold."""
    exact = {
        (r["a_id"], r["b_id"], r["dot"])
        for r in entry_mod.queries()["embedding_near_dup"](spark, SF_DIR).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"], r["dot"])
        for r in entry_mod.queries()["embedding_near_dup_lsh"](spark, SF_DIR).collect()
    }
    assert lsh <= exact
    assert exact, "threshold should produce pairs at sf0.001"
    assert lsh, "4-plane SRP buckets should retain some near-dup pairs"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"url_norm", "host", "seq", "sched_ms"}


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    ddf = duck.sql(oracle)
    duck_cols = ddf.columns
    duck_rows = ddf.fetchall()
    s_cols, s_rows = _norm_rows(sdf.columns, spark_rows)
    d_cols, d_rows = _norm_rows(duck_cols, duck_rows)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mism, f"{name}: first mismatch at {mism[0]}: {s_rows[mism[0]]} vs {d_rows[mism[0]]}"


HELD_OUT = {
    # one unseen natural-orthography sentence per language — none of
    # these sentences (or their clauses) appear in langid._SAMPLES.
    # Pinned at 11/11 since the round-5 diacritic-preserving profiles
    # (the ASCII-folded round-4 profiles mislabeled short pl as it).
    "en": "the old librarian counted seven green bottles near the door",
    "de": "die müde gärtnerin trug einen schweren korb voller äpfel über die brücke",
    "fr": "le boulanger préparait déjà les gâteaux pour la fête du village",
    "es": "el jardinero regaba las flores pequeñas junto al camino cada tarde",
    "it": "il vecchio sarto cuciva un vestito azzurro per la figlia del fornaio",
    "pt": "o pescador voltou cedo da praia com um cesto cheio de peixes",
    "nl": "de jonge schilder mengde rustig zijn verf naast het open raam",
    "sv": "den gamla läraren läste långsamt en bok om öarna i norr",
    "pl": "młody piekarz niósł świeże bułki przez wąską uliczkę do rynku",
    "id": "petani tua itu membawa sekeranjang buah ke pasar setiap pagi",
    "tr": "yaşlı bahçıvan her sabah çiçekleri soğuk suyla suluyordu",
}


def test_lang_id_trigram_held_out(spark):
    """11/11 on held-out sentences (VERDICT r4 stretch item 7)."""
    from crawlspark.functions.langid import _SAMPLES, lang_id_trigram

    for lang, sent in HELD_OUT.items():
        assert sent not in _SAMPLES[lang]
    docs = spark.createDataFrame(
        [(lang, sent) for lang, sent in sorted(HELD_OUT.items())],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in lang_id_trigram(docs).collect()
    }
    wrong = {k: v for k, v in got.items() if k != v}
    assert not wrong, f"held-out misses: {wrong}"
