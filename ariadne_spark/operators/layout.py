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
