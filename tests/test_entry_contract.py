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


@pytest.mark.parametrize("name", FAST_ORACLE_SUBSET)
def test_fast_oracle_parity(spark, duck, name):
    from tools.check_contract import normalize

    spark_pdf = entrymod.queries()[name](spark, SF).toPandas()
    duck_pdf = duck.sql(entrymod.oracle_sql()[name]).df()
    s_cols, s_hash, _ = normalize(spark_pdf)
    d_cols, d_hash, _ = normalize(duck_pdf)
    assert s_cols == d_cols
    assert s_hash == d_hash
