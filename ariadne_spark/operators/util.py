"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread narrow inputs across the cluster before an Arrow-UDF
    scan. A table read from one or two parquet files plans one or two
    tasks, serializing the signature UDF on a single core; at lake
    scale inputs already have >= defaultParallelism partitions and
    this is a no-op (no shuffle added)."""
    from .. import context

    context.ship_package(df.sparkSession)
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
