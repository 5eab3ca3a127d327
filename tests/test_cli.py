"""CLI tests: argument semantics from bin/lexmapr:24-58 and byte-exact
golden reproduction through the end-user entry point."""

import json
import os
import subprocess
import sys

import pytest

from lexmapr_spark.cli import build_parser, main, valid_input_file
from tests.golden_harness import EXPECTED_DIR, INPUT_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_input_validation(tmp_path):
    import argparse
    with pytest.raises(argparse.ArgumentTypeError):
        valid_input_file("samples.txt")
    with pytest.raises(FileNotFoundError):
        valid_input_file("nope.csv")
    p = tmp_path / "ok.csv"
    p.write_text("h1,h2\n")
    assert valid_input_file(str(p)) == str(p)


def test_cli_reproduces_golden_byte_exact(tmp_path):
    out = tmp_path / "out.tsv"
    rc = main([os.path.join(INPUT_DIR, "small_simple.csv"),
               "--full", "-o", str(out)])
    assert rc == 0
    with open(os.path.join(EXPECTED_DIR, "small_simple.tsv")) as f:
        assert out.read_text() == f.read()


def test_cli_bucket_profile(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([os.path.join(INPUT_DIR, "small_simple.csv"), "-p", "ifsac"])
    assert rc == 0
    text = (tmp_path / "ifsac_output.tsv").read_text()
    header = text.split("\n")[0].split("\t")
    assert header[-1] == "Third Party Classification"
    assert len(text.rstrip("\n").split("\n")) > 1


def test_cli_config_local_owl(tmp_path):
    cfg = tmp_path / "cfg.json"
    owl = os.path.join(REPO, "tests", "ontologies", "pizza.owl")
    cfg.write_text(json.dumps(
        [{owl: "http://www.co-ode.org/ontologies/pizza/pizza.owl#Spiciness"}]))
    out = tmp_path / "out.tsv"
    rc = main([os.path.join(INPUT_DIR, "small_simple.csv"),
               "-c", str(cfg), "-o", str(out)])
    assert rc == 0 and out.read_text().count("\n") > 1
    # network-shaped entries fail fast with a clear offline message
    # (ValueError from resolve_ontology_path, not a confusing
    # FileNotFoundError on the URL string — r6 change)
    cfg.write_text(json.dumps([{"http://purl.example/x.owl": "r"}]))
    with pytest.raises(ValueError, match="offline"):
        main([os.path.join(INPUT_DIR, "small_simple.csv"), "-c", str(cfg)])
    # file:// URIs unwrap to the local path and compile unchanged
    cfg.write_text(json.dumps(
        [{"file://" + owl:
          "http://www.co-ode.org/ontologies/pizza/pizza.owl#Spiciness"}]))
    out2 = tmp_path / "out2.tsv"
    rc = main([os.path.join(INPUT_DIR, "small_simple.csv"),
               "-c", str(cfg), "-o", str(out2)])
    assert rc == 0 and out2.read_text() == out.read_text()


def test_cli_lexicon_cache_roundtrip(tmp_path):
    cache = tmp_path / "lex.json"
    out1, out2 = tmp_path / "a.tsv", tmp_path / "b.tsv"
    main([os.path.join(INPUT_DIR, "small_simple.csv"),
          "--cache", str(cache), "-o", str(out1)])
    assert cache.exists()
    main([os.path.join(INPUT_DIR, "small_simple.csv"),
          "--cache", str(cache), "-o", str(out2)])  # loads from cache
    assert out1.read_text() == out2.read_text()


def test_cli_executable_version():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "lexmapr-spark"), "-v"],
        capture_output=True, text=True)
    assert r.returncode == 0 and "0.7.3-spark" in r.stdout + r.stderr


def test_cli_spark_mode_matches_local_bytes(tmp_path):
    a, b = tmp_path / "local.tsv", tmp_path / "spark.tsv"
    src = os.path.join(INPUT_DIR, "small_simple.csv")
    main([src, "--full", "-b", "-o", str(a)])
    main([src, "--full", "-b", "--spark", "2", "-o", str(b)])
    assert a.read_text() == b.read_text()


def test_cli_sharded_output(tmp_path):
    """--sharded-output writes the distributed wide artifact: same
    header, same row set as -o, rows globally url-sorted across the
    concatenated part files."""
    import glob

    src = os.path.join(INPUT_DIR, "small_simple.csv")
    single = tmp_path / "single.tsv"
    sharded = tmp_path / "sharded"
    main([src, "--full", "-b", "--spark", "2", "-o", str(single),
          "--sharded-output", str(sharded)])
    got = (sharded / "_header.tsv").read_text()
    for p in sorted(glob.glob(str(sharded / "part-*"))):
        got += open(p).read()
    # sharded rows are url-sorted; compare line sets + header
    single_lines = single.read_text().rstrip("\n").split("\n")
    got_lines = got.rstrip("\n").split("\n")
    assert got_lines[0] == single_lines[0]
    assert sorted(got_lines[1:]) == sorted(single_lines[1:])
    assert got_lines[1:] == sorted(got_lines[1:])


def test_cli_sharded_output_requires_spark(tmp_path):
    src = os.path.join(INPUT_DIR, "small_simple.csv")
    with pytest.raises(SystemExit, match="--spark"):
        main([src, "--sharded-output", str(tmp_path / "x")])
