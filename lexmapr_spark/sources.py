"""Distributed input sources.

The reference ingests csv/tsv sample files row-at-a-time on one thread
(``lexmapr/pipeline.py:96-112``: delimiter by extension, skip header,
``sample_id = row[0].strip()``, ``sample_desc = " ".join(row[1:]).
strip()``). This module is the same contract as a Spark scan, so a
100 TB directory of sample files fans out across the cluster with
Spark's splittable CSV reader instead of a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_samples_df(spark: SparkSession, path: str,
                    multi_col: bool = True) -> DataFrame:
    """csv/tsv sample file(s) -> (url, text) DataFrame.

    Matches the reference reader exactly: delimiter from the file
    extension, first line is a header, first column is the id, ALL
    remaining columns are space-joined into the description
    (``" ".join(row[1:])`` — empty trailing columns contribute empty
    strings, which the join keeps as double spaces; ``concat_ws``
    would skip NULLs, so empties are coalesced first). Output column
    names are (url, text) so the result feeds ``engine.annotate``
    unchanged.

    ``path`` may be a single file, a glob, or a directory — Spark's
    CSV scan splits large files and parallelizes across many, which is
    the 100 TB ingest story the reference's single file handle cannot
    give.
    """
    delim = "\t" if path.endswith(".tsv") else ","
    df = (spark.read
          .option("header", "true")
          .option("sep", delim)
          # reference uses csv.reader defaults: quoted fields with
          # embedded delimiters/newlines are single values
          .option("quote", '"')
          .option("escape", '"')
          .option("multiLine", "true")
          .csv(path))
    cols = df.columns
    if not cols:
        raise ValueError(f"{path}: no columns found")
    id_col = F.trim(F.coalesce(F.col(cols[0]), F.lit(""))).alias("url")
    if len(cols) == 1 or not multi_col:
        text = F.lit("")
    else:
        text = F.concat_ws(
            " ", *[F.coalesce(F.col(c), F.lit("")) for c in cols[1:]])
    return df.select(id_col, F.trim(text).alias("text"))
