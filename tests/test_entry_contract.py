"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
keys are consistent, and a fast subset cross-checks against DuckDB
at sf0.001 (the full sweep lives in tools/check_contract.py)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from lexmapr_spark import engine

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FAST_ORACLE_SUBSET = [
    "s2_multicol_coalesce", "p6_preprocess", "agg_event_histogram",
    "sort_topk_orders", "dedup_exact", "text_fingerprint",
    "ann_cosine_topk",
]


@pytest.fixture(scope="module")
def spark():
    s = engine.build_spark(cpus=4, app="entry_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["subj", "pred", "obj"]
    assert df.count() >= 0


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, o - q
    # the majority of operators should be oracle-checked
    assert len(o) >= 15


def test_oracled_queries_are_scalar_only(spark):
    """Driver-canonicalizer hazard guard: the correctness harness sorts
    raw result columns with pandas, which cannot sort array/map/struct
    cells — every oracled query must therefore emit scalar columns only
    (serialize or explode any nested value)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    oracled = set(entrymod.oracle_sql())
    qs = entrymod.queries()
    offenders = []
    for name in sorted(oracled):
        schema = qs[name](spark, SF).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, offenders


def test_no_decimal_outputs(spark):
    """r7 verdict: Spark.toPandas() renders DECIMAL columns as
    decimal.Decimal objects while DuckDB .df() yields float64 — hash
    normalizers that stringify rather than coerce see them differ even
    when values are identical (events_range_join was driver hash-red
    for exactly this). DECIMAL is an internal order-independence tool
    only: every queries() entry must cast decimal sums back to DOUBLE
    in its final projection."""
    from pyspark.sql.types import DecimalType

    offenders = []
    for name, fn in sorted(entrymod.queries().items()):
        for field in fn(spark, SF).schema.fields:
            if isinstance(field.dataType, DecimalType):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, offenders


@pytest.mark.parametrize("name", FAST_ORACLE_SUBSET)
def test_fast_oracle_parity(spark, duck, name):
    from tools.check_contract import normalize

    spark_pdf = entrymod.queries()[name](spark, SF).toPandas()
    duck_pdf = duck.sql(entrymod.oracle_sql()[name]).df()
    s_cols, s_hash, _ = normalize(spark_pdf)
    d_cols, d_hash, _ = normalize(duck_pdf)
    assert s_cols == d_cols
    assert s_hash == d_hash


def test_kg_fixture_oracles_present_and_runnable():
    """r6: the 5 matcher-driven kg_* queries gained fixture oracles —
    SELECTs over reference-truth parquet built by
    tools/build_kg_oracle_fixture.py. Guard that the fixtures exist,
    every kg oracle parses/executes in DuckDB standalone (absolute
    paths, no views needed), and the per-doc truth covers the whole
    sf0.01 corpus."""
    import os

    fix = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "kg_oracle")
    for f in ("ref_rows.parquet", "confidence.parquet",
              "canon_map.parquet"):
        assert os.path.exists(os.path.join(fix, f)), f

    oracles = entrymod.oracle_sql()
    kg = [k for k in oracles if k.startswith("kg_")
          and k != "kg_text_extraction"]
    assert set(kg) >= {"kg_triples", "kg_match_histogram",
                       "kg_classification_histogram",
                       "kg_canonical_triples",
                       "kg_confidence_histogram"}
    con = duckdb.connect()
    for name in kg:
        assert len(con.sql(oracles[name]).df()) > 0, name
    n = con.sql(f"SELECT count(*) FROM "
                f"read_parquet('{fix}/ref_rows.parquet')").fetchone()[0]
    assert n == 500
    con.close()


def test_p5_prescreen_matches_bare_try_cast(spark):
    """r9: the digit/special-literal prescreen in front of try_cast
    must be decision-identical to the bare try_cast form it replaced
    (the prescreen exists because a failed string->double cast
    throws/catches a JVM exception per token)."""
    from pyspark.sql import functions as F

    adv = ["1 +1 -1.5 .5 5. 1e5 1E-5 1e e5 inf Inf INF INFINITY +inf",
           "-infinity nan NaN NAN +nan -nan 1.5d 1.5f 1.5D 0x1p3 0xA",
           "1_000 one 1,000 12.3.4 +-1 --1 ++1 . + - 1e308 1e309",
           "١٢ i-n-f n a n infinityd nand Infinity -Infinity",
           "\tinf\t 1 abc123 123abc 9 00 007 2. -1e309",
           "", " ", "join scan in f ni fi nf infin infinity0"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(adv)],
                               "doc_id LONG, text STRING")
    old = "size(filter(split(text, ' '), x -> try_cast(x AS DOUBLE) IS NOT NULL))"
    new = ("size(filter(split(text, ' '), "
           "x -> CASE WHEN translate(x, '0123456789', '') != x "
           "OR lower(regexp_replace(x, '[^a-zA-Z]', '')) "
           "IN ('inf', 'infinity', 'nan') "
           "THEN try_cast(x AS DOUBLE) IS NOT NULL ELSE false END))")
    rows = df.select("doc_id", F.expr(old).alias("o"),
                     F.expr(new).alias("n")).collect()
    bad = [(r.doc_id, r.o, r.n) for r in rows if r.o != r.n]
    assert not bad, bad
