"""Data-layout optimization: rewrite raw lake files clustered by a
column so file-level indexes prune effectively.

File-grain pruning (the engine's core mechanism) only pays off when
values are physically clustered: a range index over files with random
key placement matches every file. The reference optimizes its INDEX
tables (Delta OPTIMIZE — reference: Index.scala:724-744) but leaves
data-file layout to the user; this operator closes that gap
Spark-first:

* ``repartitionByRange(n, col)`` — one range shuffle; Spark samples
  the column to build balanced range bounds, so skewed keys still
  give even file sizes (at 100 TB this is the same shuffle any
  global sort pays, and AQE coalesces empty buckets).
* ``sortWithinPartitions`` — in-memory per-task sort, no extra
  shuffle; gives parquet row-group min/max stats a monotone layout so
  row-group pruning works inside each file too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..storage.fs import get_fs as _get_fs


def cluster_files(
    df: DataFrame,
    out_dir: str,
    by: str,
    n_files: int = 8,
) -> list[str]:
    """Rewrite ``df`` as ``n_files`` parquet files range-clustered on
    ``by``; returns the new file paths (register them with
    ``Index.add_files``). Disjoint value ranges per file make a range
    index prune to ~1 file per point lookup instead of all of them."""
    (
        df.repartitionByRange(n_files, by)
        .sortWithinPartitions(by)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    fs = _get_fs(df.sparkSession, out_dir)
    return [
        p
        for p in fs.list_files(out_dir, suffix=".parquet")
        if p.rsplit("/", 1)[1].startswith("part-")
    ]


def with_zorder_value(
    df: DataFrame, cols: list[str], bits: int = 6, z_col: str = "__z"
) -> DataFrame:
    """Append a Morton (Z-order) interleave of per-column quantile-bin
    ids — the multi-dimensional clustering key Delta's OPTIMIZE
    ZORDER BY is built on (public technique; implemented here with
    only DataFrame built-ins).

    Per column: ``approxQuantile`` computes 2^bits - 1 cut points
    (sample-based, the driver receives a few hundred doubles no matter
    the data size), the bin id is a literal CASE chain (whole-stage
    codegen), and bin bits interleave via shift/and arithmetic over
    the MATERIALIZED bin columns (each CASE chain evaluates once, not
    once per bit — keeps generated code far under the janino method
    limit). Skewed columns still bin evenly because cuts are
    quantiles, not uniform ranges. Nulls bin to 0.
    """
    from pyspark.sql import functions as F

    n_bins = 1 << bits
    probs = [i / n_bins for i in range(1, n_bins)]
    bin_names = []
    for ci, c in enumerate(cols):
        cuts = df.approxQuantile(c, probs, 0.001)
        # strictly increasing cut list (duplicate quantiles collapse)
        uniq = []
        for v in cuts:
            if not uniq or v > uniq[-1]:
                uniq.append(v)
        # bin = number of cuts strictly below the value (nulls -> 0):
        # nested whens test the largest cut first
        expr = F.lit(0)
        for i, cut in enumerate(uniq):
            expr = F.when(F.col(c) > F.lit(cut), F.lit(i + 1)).otherwise(expr)
        name = f"{z_col}b{ci}"
        df = df.withColumn(name, expr)
        bin_names.append(name)
    z = F.lit(0)
    k = len(cols)
    for bit in range(bits):
        for ci, name in enumerate(bin_names):
            pos = bit * k + ci
            z = z + F.shiftleft(
                F.shiftright(F.col(name), bit).bitwiseAND(F.lit(1)), pos
            )
    return df.withColumn(z_col, z).drop(*bin_names)


def cluster_files_zorder(
    df: DataFrame,
    out_dir: str,
    by: list[str],
    n_files: int = 8,
    bits: int = 6,
) -> list[str]:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the
    Z-order curve over ``by`` — point/range queries on ANY of the
    clustered columns prune to a fraction of files, where single-column
    range clustering helps only its own column. One range shuffle on
    the interleaved key + an in-task sort, same cost shape as
    :func:`cluster_files`."""
    zdf = with_zorder_value(df, by, bits)
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    fs = _get_fs(df.sparkSession, out_dir)
    return [
        p
        for p in fs.list_files(out_dir, suffix=".parquet")
        if p.rsplit("/", 1)[1].startswith("part-")
    ]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int,
    path: str | None = None,
    sort_by: str | list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed + sorted parquet table — the
    co-located-join layout: two tables bucketed the same way on the
    join key sort-merge-join with ZERO exchanges and zero sorts (the
    per-bucket files are already hash-partitioned and sorted), which
    at 100 TB removes the single most expensive stage of a repeated
    big join. Bucket metadata lives in the session catalog
    (``saveAsTable``); plain parquet paths cannot carry it."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    sort_cols = (
        cols
        if sort_by is None
        else ([sort_by] if isinstance(sort_by, str) else list(sort_by))
    )
    w = (
        df.write.bucketBy(n_buckets, *cols)
        .sortBy(*sort_cols)
        .mode("overwrite")
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark_or_left, left_table: str, right_table: str, on, how: str = "inner"
):
    """Join two same-bucketed catalog tables; returns the DataFrame.
    With matching bucket specs Catalyst plans a shuffle-free
    sort-merge join — callers can assert no Exchange in the plan."""
    spark = spark_or_left
    return spark.table(left_table).join(spark.table(right_table), on, how)
