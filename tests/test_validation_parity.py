"""Index configuration validation + temporal select-interaction parity
with the reference's IndexTests / RangeIndexTests / TemporalIndexTests
cases not yet pinned elsewhere."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ariadne_spark import Index
from ariadne_spark.exceptions import (
    ColumnNotFoundError,
    NotTopLevelColumnError,
)

from .conftest import assert_same_rows


def test_temporal_rejects_nonexistent_value_column(spark, storage, events_files):
    """reference: TemporalIndexTests.scala:48-54."""
    df, _ = events_files
    idx = Index.for_name("tv_bad", schema=df.schema, format="parquet", spark=spark)
    with pytest.raises(ColumnNotFoundError):
        idx.add_temporal_index("no_such", "ts")


def test_temporal_rejects_nonexistent_timestamp_column(
    spark, storage, events_files
):
    """reference: TemporalIndexTests.scala:56-62."""
    df, _ = events_files
    idx = Index.for_name("tt_bad", schema=df.schema, format="parquet", spark=spark)
    with pytest.raises(ColumnNotFoundError):
        idx.add_temporal_index("user_id", "no_such_ts")


def test_value_persisting_types_reject_nested_columns(spark, storage):
    """reference: TemporalIndexTests.scala:535-565 — regular/bloom/
    range/temporal value columns must be top-level (only the temporal
    TIMESTAMP may be nested)."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("v", LongType()),
                        StructField("at", TimestampType()),
                    ]
                ),
            ),
        ]
    )
    idx = Index.for_name("nested", schema=schema, format="parquet", spark=spark)
    for add in (
        lambda: idx.add_index("meta.v"),
        lambda: idx.add_bloom_index("meta.v"),
        lambda: idx.add_range_index("meta.v"),
        lambda: idx.add_temporal_index("meta.v", "meta.at"),
    ):
        with pytest.raises((NotTopLevelColumnError, ColumnNotFoundError)):
            add()
    # nested TIMESTAMP on a top-level value column is fine
    idx.add_temporal_index("id", "meta.at")


def test_range_rejects_nonexistent_column(spark, storage, orders_files):
    """reference: RangeIndexTests.scala:172-178."""
    df, _ = orders_files
    idx = Index.for_name("r_bad", schema=df.schema, format="parquet", spark=spark)
    with pytest.raises(ColumnNotFoundError):
        idx.add_range_index("no_such")


def test_range_value_in_all_files_returns_all(spark, storage, orders_files):
    """reference: RangeIndexTests.scala:90-104 — a band overlapping
    every file's [min,max] prunes nothing."""
    df, files = orders_files
    idx = Index.for_name("r_all", schema=df.schema, format="parquet", spark=spark)
    idx.add_range_index("o_custkey").add_files(files).update()
    # o_custkey is uniformly spread: every file covers ~the full domain
    lo, hi = df.agg(F.min("o_custkey"), F.max("o_custkey")).collect()[0]
    mid = (lo + hi) // 2
    located = idx.locate_files({"o_custkey": [mid]})
    assert sorted(located) == sorted(files)


def test_select_validates_column_names(spark, storage, orders_files):
    """reference: IndexTests.scala:572-585."""
    df, files = orders_files
    idx = Index.for_name("sel_v", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey")
    with pytest.raises(ColumnNotFoundError):
        idx.select("o_custkey", "not_a_column")


def test_temporal_dedup_when_select_drops_timestamp(
    spark, storage, events_files
):
    """reference: TemporalIndexTests.scala:385-406 — dropping the
    timestamp column from the selection must NOT break latest-version
    dedup (ranking happens against original rows before projection)."""
    df, files = events_files
    idx = Index.for_name("tsel", schema=df.schema, format="parquet", spark=spark)
    idx.add_temporal_index("user_id", "ts").add_files(files).update()
    idx.select("event_id", "user_id", "event_type")
    users = spark.createDataFrame([(i,) for i in range(0, 10)], ["user_id"])
    res = idx.join(users, on=["user_id"])
    assert "ts" not in res.columns
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").asc()
    )
    expected = (
        df.join(users, ["user_id"])
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("event_id", "user_id", "event_type")
    )
    # one row per user, and it is the latest row
    assert res.count() == expected.count()
    assert_same_rows(res, expected, "event_id", "user_id", "event_type")


@pytest.mark.slow
def test_temporal_keeps_timestamp_when_selected(spark, storage, events_files):
    """reference: TemporalIndexTests.scala:408-430."""
    df, files = events_files
    idx = Index.for_name("tsel2", schema=df.schema, format="parquet", spark=spark)
    idx.add_temporal_index("user_id", "ts").add_files(files).update()
    idx.select("event_id", "user_id", "ts")
    users = spark.createDataFrame([(i,) for i in range(0, 5)], ["user_id"])
    res = idx.join(users, on=["user_id"])
    assert "ts" in res.columns
    assert res.count() == 5
