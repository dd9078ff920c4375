"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-safe equi-join for hot keys AQE can't fix (e.g. when the
    skewed side feeds an aggregation pinned to the same partitioning,
    or a single key exceeds the skewed-partition split size).

    The big/skewed ``left`` side scatters each row into one of
    ``salt`` buckets by a deterministic row hash; the smaller
    ``right`` side replicates ``salt``× via an exploded literal
    range. The join key becomes (on..., __salt), so one hot key
    spreads over ``salt`` reducer partitions instead of one
    straggler. Row multiplicity is unchanged — every left row meets
    each matching right row exactly once (in the bucket it landed
    in). Results are identical to ``left.join(right, on, how)`` for
    ``inner``/``left`` joins; right/full joins would need the
    replicated side deduped back and are rejected.

    Cost: |right| × salt replication — keep ``salt`` ≲ 64 and the
    right side the smaller relation (the usual skew shape: fact × dim
    with a hot dimension key)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: "
            "replicating the right side would duplicate its unmatched rows"
        )
    import uuid

    # collision-free temp column; hash only the join keys (always
    # hashable — they're equi-join keys) + a per-row id so identical
    # keys still scatter. Hashing all columns would break on MapType
    # or an existing __salt column.
    salt_col = f"__salt_{uuid.uuid4().hex[:8]}"
    scatter = F.pmod(
        F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()),
        F.lit(salt),
    ).cast("int")
    l = left.withColumn(salt_col, scatter)
    r = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, on + [salt_col], how).drop(salt_col)
