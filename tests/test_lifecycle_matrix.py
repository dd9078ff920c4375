"""Lifecycle matrices ported from the reference's remaining suites:
per-type column backfill (ColumnBackfillTests), compaction of large
tables / empty indexes / auto-compact thresholds (CompactionTests),
file-size decrement on delete (FileSizeTrackingTests), under-limit
auto-bloom absence + multi-column auto-bloom
(AutoBloomLargeIndexTests), and catalog/metadata robustness
(BugFixTests M9/M11, IndexCatalogTests)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from ariadne_spark import Index, catalog

from .conftest import assert_same_rows


# ------------------------------------------------------------- backfill

def _build(spark, files, df, name, **idx_cols):
    idx = Index.for_name(name, schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey").add_files(files).update()
    return idx


def test_backfill_regular_column(spark, storage, orders_files):
    df, files = orders_files
    idx = _build(spark, files, df, "bf_reg")
    idx.add_index("o_orderkey")
    idx.update()
    vals = [5, 6, 7]
    assert_same_rows(
        idx.read_matching({"o_orderkey": vals}).select("o_orderkey"),
        df.where(F.col("o_orderkey").isin(vals)).select("o_orderkey"),
    )


def test_backfill_computed_column(spark, storage, orders_files):
    df, files = orders_files
    idx = _build(spark, files, df, "bf_comp")
    idx.add_computed_index("oyear", "cast(year(o_orderdate) as bigint)")
    idx.update()
    got = idx.read_matching({"oyear": [1995]})
    exp = df.where(F.expr("year(o_orderdate)") == 1995)
    assert got.count() == exp.count() > 0


def test_backfill_bloom_column(spark, storage, orders_files):
    df, files = orders_files
    idx = _build(spark, files, df, "bf_bloom")
    idx.add_bloom_index("o_orderkey", fpr=0.01)
    idx.update()
    vals = [10, 11, 12]
    assert_same_rows(
        idx.read_matching({"o_orderkey": vals}).select("o_orderkey"),
        df.where(F.col("o_orderkey").isin(vals)).select("o_orderkey"),
    )


def test_backfill_temporal_column(spark, storage, events_files):
    df, files = events_files
    idx = Index.for_name("bf_temp", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("event_type").add_files(files).update()
    idx.add_temporal_index("user_id", "ts")
    idx.update()
    got = idx.join(
        df.select("user_id").distinct().limit(5), on=["user_id"]
    )
    # one latest row per requested user
    assert got.groupBy("user_id").count().where("count > 1").count() == 0


def test_backfill_multiple_columns_at_once(spark, storage, orders_files):
    df, files = orders_files
    idx = _build(spark, files, df, "bf_multi")
    idx.add_index("o_orderkey")
    idx.add_computed_index("oyear", "cast(year(o_orderdate) as bigint)")
    idx.update()
    vals = [20, 21]
    assert_same_rows(
        idx.read_matching({"o_orderkey": vals}).select("o_orderkey"),
        df.where(F.col("o_orderkey").isin(vals)).select("o_orderkey"),
    )
    assert idx.read_matching({"oyear": [1996]}).count() == df.where(
        F.expr("year(o_orderdate)") == 1996
    ).count()


def test_backfill_idempotent_second_update(spark, storage, orders_files):
    df, files = orders_files
    idx = _build(spark, files, df, "bf_idem")
    idx.add_index("o_orderkey")
    idx.update()
    before = sorted(glob.glob(f"{storage}/**/*.parquet", recursive=True))
    idx.update()  # no new files, no new columns: must be a no-op
    after = sorted(glob.glob(f"{storage}/**/*.parquet", recursive=True))
    assert before == after


def test_backfill_with_new_files_simultaneously(spark, storage, orders_files):
    df, files = orders_files
    idx = Index.for_name("bf_both", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey").add_files(files[:2]).update()
    idx.add_index("o_orderkey")
    idx.add_files(files[2:])
    idx.update()  # backfill old files + index new files in one pass
    vals = [5, 6, 7, 2999]
    assert_same_rows(
        idx.read_matching({"o_orderkey": vals}).select("o_orderkey"),
        df.where(F.col("o_orderkey").isin(vals)).select("o_orderkey"),
    )


@pytest.mark.slow
def test_temporal_mid_backfill_null_stays_candidate(spark, storage, events_files):
    """r10 (ADVICE): a file whose temporal value array is NULL with no
    live spill rows is ambiguous — an empty file (exact to prune) or a
    mid-backfill null-fill for a newly added temporal column (pruning
    would LOSE its possibly-latest rows). W2 must keep such orphan
    files as candidates; the W1 read-time dedup keeps the final rows
    exact either way."""
    df, files = events_files
    idx = Index.for_name(
        "bf_orphan", schema=df.schema, format="parquet", spark=spark
    )
    idx.add_temporal_index("user_id", "ts").add_files(files).update()
    users = sorted(
        r[0] for r in df.select("user_id").distinct().limit(3).collect()
    )
    probe = spark.createDataFrame([(u,) for u in users], ["user_id"])
    before = set(idx.locate_files({"user_id": users}))
    assert before
    expected = {tuple(r) for r in idx.join(probe, on=["user_id"]).collect()}

    # simulate the mid-backfill snapshot: null one candidate file's
    # value array WITHOUT writing spill rows
    victim = sorted(before)[0]
    cfg = idx.meta.config_for("user_id")
    main = idx.table.read()
    null_arr = F.lit(None).cast(main.schema[cfg.stored_column].dataType)
    idx.table.overwrite(
        main.withColumn(
            cfg.stored_column,
            F.when(F.col("filename") == victim, null_arr).otherwise(
                F.col(cfg.stored_column)
            ),
        )
    )
    idx._invalidate()
    after = set(idx.locate_files({"user_id": users}))
    assert victim in after, (victim, after)
    got = {tuple(r) for r in idx.join(probe, on=["user_id"]).collect()}
    assert got == expected


# ----------------------------------------------------------- compaction

@pytest.mark.slow
def test_compact_large_index_tables(spark, storage, orders_files):
    df, files = orders_files
    spark.conf.set("spark.ariadne.largeIndexLimit", "50")
    try:
        idx = Index.for_name("cp_large", schema=df.schema, format="parquet", spark=spark)
        idx.add_index("o_custkey")
        for f in files:  # one update per file => one large segment each
            idx.add_files([f]).update()
        large_dir = glob.glob(f"{storage}/**/large_indexes/**/*.parquet", recursive=True)
        assert len(large_dir) >= len(files)
        idx.compact()
        # default retention (168 h, reference Index.scala:761 parity)
        # protects just-written segments for pinned readers: nothing
        # younger than the window may be reclaimed
        idx.vacuum()
        kept = glob.glob(f"{storage}/**/large_indexes/**/*.parquet", recursive=True)
        assert len(kept) >= len(large_dir)
        # retention 0 = reclaim now (compaction keeps old segments for
        # readers until an explicit vacuum)
        idx.vacuum(retention_hours=0)
        compacted = glob.glob(f"{storage}/**/large_indexes/**/*.parquet", recursive=True)
        assert len(compacted) < len(large_dir)
        vals = [5, 6, 7]
        assert_same_rows(
            idx.read_matching({"o_custkey": vals}).select("o_custkey"),
            df.where(F.col("o_custkey").isin(vals)).select("o_custkey"),
        )
    finally:
        spark.conf.unset("spark.ariadne.largeIndexLimit")


def test_compact_empty_index_is_safe(spark, storage, orders_files):
    df, _ = orders_files
    idx = Index.for_name("cp_empty", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey")
    idx.compact()  # nothing built yet: must not raise
    idx.vacuum()


def test_auto_compact_threshold(spark, storage, orders_files):
    df, files = orders_files
    spark.conf.set("spark.ariadne.autoCompactThreshold", "2")
    try:
        idx = Index.for_name("cp_auto", schema=df.schema, format="parquet", spark=spark)
        idx.add_index("o_custkey")
        idx.add_files(files[:1]).update()
        idx.add_files(files[1:2]).update()  # 2nd batch: crosses threshold
        assert idx.meta.batches_since_compact == 0
    finally:
        spark.conf.unset("spark.ariadne.autoCompactThreshold")


def test_no_auto_compact_without_threshold(spark, storage, orders_files):
    df, files = orders_files
    idx = Index.for_name("cp_noauto", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey")
    idx.add_files(files[:1]).update()
    idx.add_files(files[1:2]).update()
    assert idx.meta.batches_since_compact == 2


# ------------------------------------------------------------ file size

def test_file_size_decrements_on_delete(spark, storage, orders_files):
    df, files = orders_files
    idx = _build(spark, files, df, "fs_del")
    total_before = idx.meta.total_indexed_bytes
    assert total_before > 0
    idx.delete_files(files[:1])
    total_after = idx.meta.total_indexed_bytes
    assert 0 < total_after < total_before
    assert total_after == total_before - os.path.getsize(files[0])


# ------------------------------------------------------------ auto-bloom

def test_no_auto_bloom_under_limit(spark, storage, orders_files):
    """Columns whose value sets stay under largeIndexLimit keep plain
    arrays — no auto_bloom column materialized."""
    df, files = orders_files
    idx = _build(spark, files, df, "ab_under")  # default limit 500k
    main = idx.index_df
    ab_cols = [c for c in main.columns if c.startswith("auto_bloom_")]
    assert ab_cols == [] or all(
        main.where(F.col(c).isNotNull()).count() == 0 for c in ab_cols
    )


@pytest.mark.slow
def test_multiple_auto_bloom_columns(spark, storage, orders_files):
    df, files = orders_files
    spark.conf.set("spark.ariadne.largeIndexLimit", "50")
    try:
        idx = Index.for_name("ab_multi", schema=df.schema, format="parquet", spark=spark)
        idx.add_index("o_custkey").add_index("o_orderkey")
        idx.add_files(files).update()
        main = idx.index_df
        assert "auto_bloom_o_custkey" in main.columns
        assert "auto_bloom_o_orderkey" in main.columns
        for col, vals in (("o_custkey", [5, 6]), ("o_orderkey", [7, 8])):
            assert_same_rows(
                idx.read_matching({col: vals}).select(col),
                df.where(F.col(col).isin(vals)).select(col),
            )
    finally:
        spark.conf.unset("spark.ariadne.largeIndexLimit")


# -------------------------------------------------------------- catalog

def test_catalog_exists_requires_metadata(spark, storage):
    os.makedirs(f"{storage}/indexes/ghost", exist_ok=True)  # dir, no metadata
    assert not catalog.exists("ghost", spark=spark)


def test_catalog_remove_deletes_storage_dir(spark, storage, orders_files):
    df, files = orders_files
    idx = _build(spark, files, df, "rm_me")
    assert catalog.exists("rm_me", spark=spark)
    catalog.remove("rm_me", spark=spark)
    assert not catalog.exists("rm_me", spark=spark)
    assert glob.glob(f"{storage}/**/rm_me/metadata.json", recursive=True) == []
