"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = 0) -> DataFrame:
    """Round-robin repartition a too-coarse input so CPU-bound stages
    use the whole cluster (mirrors ``engine.annotate``'s auto
    fan-out).

    A single parquet file scans as ONE partition -> one task -> one
    core; real 100 TB inputs arrive with thousands of splits and skip
    this (the repartition only fires when the input has fewer
    partitions than the session's default parallelism). Pass ``None``
    to forbid the shuffle entirely.
    """
    if min_partitions is None or df.isStreaming:
        # streaming DataFrames have no .rdd and get their parallelism
        # from the source trigger; leave them untouched
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
