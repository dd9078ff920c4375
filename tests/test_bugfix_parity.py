"""Pinned-bug parity with the reference's BugFixTests.scala: each test
reproduces a bug class the reference fixed and asserts this engine
never had/regressed it."""

from __future__ import annotations

import glob
import uuid

import pytest
from pyspark.sql import functions as F

from ariadne_spark import catalog
from ariadne_spark.exceptions import IndexNotFoundError
from ariadne_spark.index import Index
from ariadne_spark.storage.metadata import load_metadata

from .conftest import WORK


@pytest.fixture()
def users_files(spark):
    """Array-of-struct table where TWO fields of the same array are
    independently useful as exploded indexes."""
    out = f"{WORK}/bugfix-{uuid.uuid4().hex[:8]}"
    rows = [
        (1, [(100, "admin"), (101, "user")]),
        (2, [(102, "ops")]),
        (3, [(100, "ops"), (103, "admin")]),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, users array<struct<id: long, role: string>>"
    )
    for i in range(2):
        df.where(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/p{i}")
    files = sorted(glob.glob(f"{out}/p*/*.parquet"))
    yield df, files
    import shutil

    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.slow
def test_two_exploded_fields_same_array_no_collision(
    spark, storage, users_files
):
    """reference: BugFixTests.scala:21-68 (H2) — two exploded indexes
    over different fields of ONE array column must build without
    colliding and each must locate correctly."""
    df, files = users_files
    idx = Index.for_name(
        f"bf_h2_{uuid.uuid4().hex[:6]}",
        schema=df.schema,
        format="parquet",
        spark=spark,
    )
    idx.add_exploded_index("users", "user_id", field="id")
    idx.add_exploded_index("users", "user_role", field="role")
    idx.add_files(files)
    idx.update()

    # split by event_id % 2: p0 = {event 2}, p1 = {events 1, 3}
    by_id = idx.locate_files({"user_id": [100]})
    by_role = idx.locate_files({"user_role": ["ops"]})
    assert len(by_id) == 1  # events 1+3 share p1
    assert len(by_role) == 2  # event 2 in p0, event 3 in p1
    both = idx.locate_files({"user_id": [100], "user_role": ["ops"]})
    assert both == by_id  # AND semantics intersect to p1
    assert len(idx.locate_files({"user_id": [102]})) == 1  # p0 only


def test_add_index_failure_leaves_metadata_intact(
    spark, storage, users_files, monkeypatch
):
    """reference: BugFixTests.scala:89-105 (H7) — a failing metadata
    write during add_index must not corrupt the persisted metadata."""
    import ariadne_spark.index as index_mod

    df, files = users_files
    name = f"bf_h7_{uuid.uuid4().hex[:6]}"
    idx = Index.for_name(
        name, schema=df.schema, format="parquet", spark=spark
    )
    idx.add_index("event_id")
    before = load_metadata(idx.paths.metadata, name, fs=idx.fs).to_json()

    def boom(*a, **kw):
        raise OSError("disk full")

    monkeypatch.setattr(index_mod, "save_metadata", boom)
    with pytest.raises(OSError):
        idx.add_exploded_index("users", "user_id", field="id")
    monkeypatch.undo()

    # persisted metadata unchanged and still loadable
    after = load_metadata(idx.paths.metadata, name, fs=idx.fs)
    assert after.to_json() == before
    # a fresh handle sees the intact single-index config
    fresh = Index.for_name(name, spark=spark)
    assert [c.column for c in fresh.meta.indexes] == ["event_id"]


def test_catalog_remove_deletes_storage(spark, storage, users_files):
    """reference: BugFixTests.scala:126-137 (M9) — remove must clear
    the storage dir; a removed index is gone from the catalog."""
    df, files = users_files
    name = f"bf_m9_{uuid.uuid4().hex[:6]}"
    idx = Index.for_name(
        name, schema=df.schema, format="parquet", spark=spark
    )
    idx.add_index("event_id")
    idx.add_files(files)
    idx.update()
    assert catalog.exists(name, spark)
    catalog.remove(name, spark)
    assert not catalog.exists(name, spark)
    assert not idx.fs.exists(idx.paths.root)
    with pytest.raises(IndexNotFoundError):
        catalog.get(name, spark)


def test_catalog_exists_requires_metadata(spark, storage):
    """reference: BugFixTests.scala:151-161 (M11) — a bare directory
    under the indexes root without metadata.json is NOT an index."""
    import os

    root = f"{spark.conf.get('spark.ariadne.storagePath')}/indexes/ghost"
    os.makedirs(root, exist_ok=True)
    assert not catalog.exists("ghost", spark)
    assert "ghost" not in catalog.list_indexes(spark)
