"""Filesystem facade tests: POSIX backend, Hadoop backend over
``file:`` URIs (the unit-testable analog of hdfs:/s3a:), and the full
index lifecycle running through the Hadoop API end-to-end.

Mirrors the reference's Hadoop-FS storage primitives
(reference: src/main/scala/dev/cjfravel/ariadne/IndexMetadataOperations.scala:125-155,
IndexLock.scala:396-411, Index.scala:861-908).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from ariadne_spark.storage.fs import (
    HadoopFS,
    PosixFS,
    batch_sizes,
    get_fs,
    join,
    scheme_of,
    strip_file_scheme,
)


def _backends(spark, tmp_path):
    local = str(tmp_path)
    return [
        (PosixFS(), local),
        (HadoopFS(spark, f"file://{local}"), f"file://{local}"),
    ]


def test_scheme_helpers():
    assert scheme_of("/a/b") is None
    assert scheme_of("file:/a/b") == "file"
    assert scheme_of("s3a://bucket/k") == "s3a"
    assert join("s3a://b/root/", "x", "/y/") == "s3a://b/root/x/y"
    assert join("/a", "b") == "/a/b"


def test_fs_contract_both_backends(spark, tmp_path):
    for fs, root in _backends(spark, tmp_path):
        base = join(root, f"c-{uuid.uuid4().hex[:6]}")
        fs.mkdirs(join(base, "d"))
        assert fs.exists(join(base, "d"))
        assert fs.list_names(join(base, "missing")) == []

        target = join(base, "d", "doc.json")
        assert fs.read_text(target) is None
        assert fs.create_exclusive(target, '{"v": 1}')
        assert not fs.create_exclusive(target, '{"v": 2}')  # second loses
        assert fs.read_text(target) == '{"v": 1}'

        fs.write_atomic(target, '{"v": 3}')  # replace allowed
        assert fs.read_text(target) == '{"v": 3}'
        assert fs.size(target) == len('{"v": 3}')

        assert sorted(fs.list_names(join(base, "d"))) == ["doc.json"]
        # Hadoop normalizes file:///x to file:/x — compare scheme-stripped
        listed = fs.list_files(join(base, "d"), suffix=".json")
        assert [strip_file_scheme(p) for p in listed] == [
            strip_file_scheme(target)
        ]

        assert fs.delete(target)
        assert not fs.delete(target)  # already gone
        fs.mkdirs(join(base, "tree", "leaf"))
        fs.write_atomic(join(base, "tree", "leaf", "f.txt"), "x")
        assert fs.delete(join(base, "tree"), recursive=True)
        assert not fs.exists(join(base, "tree"))


def test_batch_sizes_mixed_schemes(spark, tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(b"x" * (10 + i))
        paths.append(str(p))
    mixed = [paths[0], f"file://{paths[1]}", paths[2], str(tmp_path / "no.bin")]
    assert batch_sizes(spark, mixed) == [10, 11, 12, 0]


def test_get_fs_selection(spark, tmp_path):
    assert isinstance(get_fs(spark, str(tmp_path)), PosixFS)
    assert isinstance(get_fs(spark, f"file://{tmp_path}"), PosixFS)
    assert isinstance(get_fs(spark, f"file://{tmp_path}"), PosixFS)
    spark.conf.set("spark.ariadne.forceHadoopFS", "true")
    try:
        assert isinstance(get_fs(spark, str(tmp_path)), HadoopFS)
    finally:
        spark.conf.unset("spark.ariadne.forceHadoopFS")


def test_index_lifecycle_through_hadoop_fs(spark, orders_files):
    """Full create→index→update→join→drop cycle with every storage
    commit routed through the Hadoop FileSystem API."""
    from ariadne_spark import Index

    df, files = orders_files
    store = f"/tmp/ariadne_tests/hdfs-{uuid.uuid4().hex[:8]}"
    old = spark.conf.get("spark.ariadne.storagePath", None)
    spark.conf.set("spark.ariadne.storagePath", store)
    spark.conf.set("spark.ariadne.forceHadoopFS", "true")
    try:
        idx = Index.for_name(
            "hfs_orders", spark=spark, schema=df.schema, format="parquet"
        )
        assert isinstance(idx.fs, HadoopFS)
        idx.add_index("o_custkey")
        idx.add_files(files)
        idx.update()
        keys = df.select("o_custkey").distinct().limit(20)
        got = idx.join(keys, on=["o_custkey"], how="inner")
        expect = df.join(keys, on=["o_custkey"], how="inner")
        assert got.count() == expect.count()
        assert Index.exists("hfs_orders", spark=spark)
        idx.drop_storage()
        assert not Index.exists("hfs_orders", spark=spark)
    finally:
        spark.conf.unset("spark.ariadne.forceHadoopFS")
        if old is not None:
            spark.conf.set("spark.ariadne.storagePath", old)
        PosixFS().delete(store, recursive=True)


def test_lock_through_hadoop_fs(spark, tmp_path):
    from ariadne_spark.storage.lock import IndexLock

    fs = HadoopFS(spark, f"file://{tmp_path}")
    a = IndexLock(str(tmp_path), "hl", max_wait=0.2, retry_interval=0.05, fs=fs)
    b = IndexLock(str(tmp_path), "hl", max_wait=0.2, retry_interval=0.05, fs=fs)
    a.acquire()
    with pytest.raises(Exception):
        b.acquire()
    a.refresh()
    a.release()
    assert b.acquire()
    b.release()


def test_parquet_table_through_hadoop_fs(spark, tmp_path):
    from ariadne_spark.storage.table import ParquetTable

    spark.conf.set("spark.ariadne.forceHadoopFS", "true")
    try:
        t = ParquetTable(
            spark, f"file://{tmp_path}/tbl", key_cols=("k",)
        )
        assert isinstance(t.fs, HadoopFS)
        t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
        t.append(spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"))
        rows = {r["k"]: r["v"] for r in t.read().collect()}
        assert rows == {1: "a", 2: "B", 3: "c"}
        t.compact()
        assert t.num_segments == 1
        t.vacuum(keep_manifests=1)
        rows = {r["k"]: r["v"] for r in t.read().collect()}
        assert rows == {1: "a", 2: "B", 3: "c"}
        t.drop()
        assert not t.exists
    finally:
        spark.conf.unset("spark.ariadne.forceHadoopFS")


def test_cluster_files_lists_via_fs(spark, tmp_path):
    from ariadne_spark.operators.layout import cluster_files

    df = spark.range(0, 1000).withColumn("k", F.col("id") % 100)
    out = cluster_files(df, f"file://{tmp_path}/clustered", by="k", n_files=4)
    assert len(out) == 4
    assert all(p.startswith("file:") for p in out)
    total = sum(
        spark.read.parquet(p).count() for p in out
    )
    assert total == 1000
