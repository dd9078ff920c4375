"""Catalog surface parity with the reference's IndexCatalogTests.scala:
list ordering, exists edge states, describe per index type, toDF shape
and content, file-based findIndexes, get round-trips, remove errors,
and partial-directory handling."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ariadne_spark import Index, catalog
from ariadne_spark.exceptions import IndexNotFoundError

from .conftest import SF_DIR


@pytest.fixture()
def orders_schema(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").schema


def test_list_empty_when_no_indexes(spark, storage):
    assert catalog.list_indexes(spark) == []


def test_list_returns_sorted_names(spark, storage, orders_schema):
    """reference: IndexCatalogTests.scala:54-63."""
    for n in ["zeta", "alpha", "mid"]:
        Index.for_name(n, schema=orders_schema, format="parquet", spark=spark)
    assert catalog.list_indexes(spark) == ["alpha", "mid", "zeta"]


def test_list_drops_removed(spark, storage, orders_schema):
    """reference: IndexCatalogTests.scala:64-73."""
    for n in ["keep", "gone"]:
        Index.for_name(n, schema=orders_schema, format="parquet", spark=spark)
    catalog.remove("gone", spark)
    assert catalog.list_indexes(spark) == ["keep"]


def test_partial_directory_not_a_catalog_entry(spark, storage, orders_schema):
    """A bare directory without metadata is not listed but IS removable
    storage junk (reference: IndexCatalogTests.scala:83-112)."""
    Index.for_name("real", schema=orders_schema, format="parquet", spark=spark)
    from ariadne_spark.storage.paths import indexes_root

    junk = os.path.join(indexes_root(storage), "junk")
    os.makedirs(junk, exist_ok=True)
    assert catalog.list_indexes(spark) == ["real"]
    assert not catalog.exists("junk", spark)


@pytest.mark.parametrize(
    "kind,add",
    [
        ("regular", lambda i: i.add_index("o_custkey")),
        ("bloom", lambda i: i.add_bloom_index("o_custkey")),
        ("computed", lambda i: i.add_computed_index("yr", "year(o_orderdate)")),
        ("range", lambda i: i.add_range_index("o_orderkey")),
    ],
)
def test_describe_per_index_type(spark, storage, orders_schema, kind, add):
    """reference: IndexCatalogTests.scala:119-194 — describe reports the
    configured column under its type for every index kind."""
    idx = Index.for_name(
        f"d_{kind}", schema=orders_schema, format="parquet", spark=spark
    )
    add(idx)
    rows = catalog.describe(f"d_{kind}", spark).collect()
    assert any(r["type"] == kind for r in rows)


def test_todf_schema_matches_reference(spark, storage, orders_schema):
    """reference: IndexCatalogTests.scala:311-328 — exact column set."""
    Index.for_name("t_schema", schema=orders_schema, format="parquet", spark=spark)
    df = catalog.to_df(spark)
    assert set(df.columns) == {
        "name",
        "format",
        "regular_indexes",
        "bloom_indexes",
        "computed_indexes",
        "temporal_indexes",
        "range_indexes",
        "exploded_field_indexes",
        "file_count",
        "total_indexed_file_size",
    }


def test_todf_contents_and_row_per_index(spark, storage, orders_schema):
    """reference: IndexCatalogTests.scala:330-354."""
    a = Index.for_name("t_a", schema=orders_schema, format="parquet", spark=spark)
    a.add_index("o_custkey")
    a.add_range_index("o_orderkey")
    Index.for_name("t_b", schema=orders_schema, format="parquet", spark=spark)
    df = catalog.to_df(spark)
    assert df.count() == 2
    row = {r["name"]: r for r in df.collect()}["t_a"]
    assert row["format"] == "parquet"
    assert "o_custkey" in row["regular_indexes"]
    assert "o_orderkey" in row["range_indexes"]
    assert row["file_count"] == 0


def test_todf_empty_catalog(spark, storage):
    df = catalog.to_df(spark)
    assert df.count() == 0 and "name" in df.columns


def test_find_indexes_for_file(spark, storage, orders_files):
    """reference: IndexCatalogTests.scala:268-309 — file-based lookup,
    sorted results, empty for untracked files."""
    df, files = orders_files
    for n in ["ff_b", "ff_a"]:
        idx = Index.for_name(n, schema=df.schema, format="parquet", spark=spark)
        idx.add_index("o_custkey")
        idx.add_files([files[0]])
    only_b = Index.for_name(
        "ff_c", schema=df.schema, format="parquet", spark=spark
    )
    only_b.add_index("o_custkey")
    only_b.add_files([files[1]])

    assert catalog.find_indexes_for_file(files[0], spark) == ["ff_a", "ff_b"]
    assert catalog.find_indexes_for_file(files[1], spark) == ["ff_c"]
    assert catalog.find_indexes_for_file("/no/such/file.parquet", spark) == []
    with pytest.raises(ValueError):
        catalog.find_indexes_for_file("  ", spark)


def test_get_returns_functional_index(spark, storage, orders_files):
    """reference: IndexCatalogTests.scala:256-266."""
    df, files = orders_files
    idx = Index.for_name("g_fn", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey")
    idx.add_files(files)
    idx.update()
    got = catalog.get("g_fn", spark)
    res = got.read_matching({"o_custkey": [5]})
    want = df.where(F.col("o_custkey") == 5).count()
    assert res.count() == want


def test_get_and_remove_missing_raise(spark, storage):
    """reference: IndexCatalogTests.scala:250-254, 363-368."""
    with pytest.raises(IndexNotFoundError):
        catalog.get("nope", spark)
    with pytest.raises(IndexNotFoundError):
        catalog.remove("nope", spark)


def test_reconnect_does_not_rewrite_metadata(spark, storage, orders_schema):
    """reference: IndexMetadataOperationsTests.scala:112-145 — opening
    an existing index must not touch the metadata file."""
    from ariadne_spark.storage.paths import IndexPaths

    Index.for_name("norw", schema=orders_schema, format="parquet", spark=spark)
    meta_path = IndexPaths(storage, "norw").metadata
    before = (os.path.getmtime(meta_path), open(meta_path).read())
    Index.for_name("norw", spark=spark)  # reconnect, no schema
    after = (os.path.getmtime(meta_path), open(meta_path).read())
    assert before == after


def test_schema_mismatch_flag(spark, storage, orders_schema):
    """reference: IndexMetadataOperationsTests.scala:175-199 — a
    different schema is rejected unless allow_schema_mismatch."""
    from pyspark.sql.types import LongType, StructField, StructType

    from ariadne_spark.exceptions import SchemaMismatchError

    Index.for_name("sm", schema=orders_schema, format="parquet", spark=spark)
    other = StructType([StructField("x", LongType())])
    with pytest.raises(SchemaMismatchError):
        Index.for_name("sm", schema=other, format="parquet", spark=spark)
    idx = Index.for_name(
        "sm", schema=other, format="parquet", spark=spark,
        allow_schema_mismatch=True,
    )
    assert idx.meta.schema == other


def test_find_indexes_for_file_uri_forms(spark, storage, orders_files):
    """URI / percent-encoded forms of a registered path must resolve
    through the same normalization add_files applied."""
    df, files = orders_files
    idx = Index.for_name("ff_uri", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey")
    idx.add_files([files[0]])
    assert catalog.find_indexes_for_file(files[0], spark) == ["ff_uri"]
    assert catalog.find_indexes_for_file("file:" + files[0], spark) == ["ff_uri"]


def test_todf_reports_file_counts_and_sizes_after_update(
    spark, storage, orders_files
):
    """reference: IndexCatalogTests.scala:195-236 — file_count and
    total_indexed_file_size reflect a real build."""
    df, files = orders_files
    idx = Index.for_name("t_sz", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey").add_files(files).update()
    row = {r["name"]: r for r in catalog.to_df(spark).collect()}["t_sz"]
    assert row["file_count"] == len(files)
    assert row["total_indexed_file_size"] > 0
