"""Distributed csv/tsv sample source vs the reference reader contract."""

import os

import pytest

from lexmapr_spark import engine
from lexmapr_spark.sources import read_samples_df
from tests.golden_harness import INPUT_DIR, read_samples


@pytest.fixture(scope="module")
def spark():
    s = engine.build_spark(cpus=4, app="sources_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.mark.parametrize("name", [
    "small_simple.csv", "zheminSamples.csv", "enteroForFreq.csv",
    "small_simple_with_tsv_input.tsv", "test_sample_id_only.csv",
    "empty.csv",
])
def test_read_samples_df_matches_driver_reader(spark, name):
    path = os.path.join(INPUT_DIR, name)
    got = {(r.url, r.text)
           for r in read_samples_df(spark, path).collect()}
    want = set(read_samples(name))
    assert got == want


def test_read_samples_df_feeds_annotate(spark):
    lex_bc = engine.broadcast_lexicon(spark)
    df = read_samples_df(
        spark, os.path.join(INPUT_DIR, "small_simple.csv"))
    t = engine.triples(engine.annotate(df, lex_bc))
    assert t.count() > 0
