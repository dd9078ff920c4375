"""FileList — the ledger of files registered with an index.

A ParquetTable of ``(filename string, added_at timestamp)`` with
insert-if-absent semantics (re-adding a file keeps the original
added_at), mirroring the reference's Delta FileList
(reference: src/main/scala/dev/cjfravel/ariadne/FileList.scala:62-67,
dedup at :112-126).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from .backend import open_table

FILELIST_SCHEMA = StructType(
    [
        StructField("filename", StringType(), False),
        StructField("added_at", TimestampType(), False),
    ]
)


class FileList:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        # segment_unique: add() dedups each batch (sorted(set(...))),
        # so every segment holds one row per filename -> min_by read
        self.table = open_table(
            spark,
            path,
            key_cols=("filename",),
            dedup="first",
            segment_unique=True,
        )

    @property
    def files(self) -> DataFrame:
        df = self.table.read()
        if df is None:
            return self.spark.createDataFrame([], FILELIST_SCHEMA)
        return df

    def filenames(self) -> list[str]:
        from .table import ParquetTable

        if isinstance(self.table, ParquetTable):
            # one filename-only scan of the live segments (explicit
            # schema, no shuffle); the driver set() collapses re-adds
            # exactly like the replace-per-key read would
            dirs = self.table.segment_dirs()
            if not dirs:
                return []
            rows = (
                self.spark.read.schema("filename string")
                .parquet(*dirs)
                .collect()
            )
            return sorted({r[0] for r in rows})
        return [r[0] for r in self.files.select("filename").collect()]

    def add(self, filenames: list[str]) -> None:
        if not filenames:
            return
        now = datetime.datetime.now()
        df = self.spark.createDataFrame(
            [(f, now) for f in sorted(set(filenames))], FILELIST_SCHEMA
        )
        self.table.append(df)

    def remove(self, filenames: list[str]) -> None:
        if not filenames or not self.table.exists:
            return
        self.table.delete_where(F.col("filename").isin(list(filenames)))

    def contains(self, filename: str) -> bool:
        return (
            self.table.exists
            and self.files.where(F.col("filename") == filename).limit(1).count() > 0
        )
