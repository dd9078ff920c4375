"""Ports of the reference's strongest test categories (SURVEY §5):

* IndexTypeExclusivityTests — every ordered pair of index types on one
  column rejected; same-config re-register idempotent.
* EmptyResultSchemaTests — join result schema independent of whether
  any file matched, across all six index types, both join directions,
  and outer joins with an active select().
* StagingRecoveryTests — reserved internal columns rejected; an orphan
  segment left by a crash between segment write and manifest commit
  never corrupts reads, converges on re-update, and is vacuumed.
* IndexLockTests — wrong-correlation release/refresh, corrupt lock
  heal, contention timeout, re-acquire after release.
* BloomFilterOperationsTests — fpr validation + empirical FPR of the
  built filter (reference BloomFilterOperationsTests.scala:219).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ariadne_spark import Index
from ariadne_spark.exceptions import (
    AriadneError,
    InvalidFprError,
    LockAcquisitionError,
    LockNotHeldError,
    ReservedColumnError,
)
from ariadne_spark.storage.lock import IndexLock

from .conftest import WORK


EX_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("status", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType([T.StructField("id", T.IntegerType(), True)])
            ),
            True,
        ),
    ]
)


# ------------------------------------------------------------ exclusivity

# kinds that may target the shared SOURCE column "id"
_SOURCE_KINDS = {
    "regular": lambda i, c: i.add_index(c),
    "bloom": lambda i, c: i.add_bloom_index(c),
    "temporal": lambda i, c: i.add_temporal_index(c, "updated_at"),
    "range": lambda i, c: i.add_range_index(c),
}
# kinds that define a NEW alias column
_ALIAS_KINDS = {
    "computed": lambda i, c: i.add_computed_index(c, "value * 2"),
    "exploded": lambda i, c: i.add_exploded_index("items", c, field="id"),
}


def test_index_type_exclusivity_all_ordered_pairs(spark, storage):
    """Walk every ordered pair so a one-directional gap (the bug the
    reference's suite pins) cannot reappear."""
    gaps = []
    for first_label, first in _SOURCE_KINDS.items():
        for second_label, second in {**_SOURCE_KINDS, **_ALIAS_KINDS}.items():
            if first_label == second_label:
                continue
            idx = Index.for_name(
                f"excl_{first_label}_{second_label}",
                schema=EX_SCHEMA,
                format="parquet",
                spark=spark,
            )
            first(idx, "id")
            try:
                second(idx, "id")
                gaps.append(f"{first_label} -> {second_label}")
            except AriadneError:
                pass
    for first_label, first in _ALIAS_KINDS.items():
        for second_label, second in {**_SOURCE_KINDS, **_ALIAS_KINDS}.items():
            if first_label == second_label:
                continue
            idx = Index.for_name(
                f"excl_{first_label}_{second_label}",
                schema=EX_SCHEMA,
                format="parquet",
                spark=spark,
            )
            first(idx, "vid")
            try:
                second(idx, "vid")
                gaps.append(f"{first_label} -> {second_label}")
            except AriadneError:
                pass
    assert not gaps, f"index type pairs wrongly accepted: {gaps}"


def test_index_reregister_same_type_idempotent(spark, storage):
    for label, register in {**_SOURCE_KINDS, **_ALIAS_KINDS}.items():
        idx = Index.for_name(
            f"idem_{label}", schema=EX_SCHEMA, format="parquet", spark=spark
        )
        col = "id" if label in _SOURCE_KINDS else "vid"
        register(idx, col)
        register(idx, col)  # must not raise
        assert len(idx.meta.indexes) == 1


def test_reserved_columns_rejected(spark, storage):
    schema = T.StructType(
        [
            T.StructField("filename", T.StringType()),
            T.StructField("file_size", T.LongType()),
            T.StructField("_ariadne_seq", T.LongType()),
            T.StructField("ok", T.LongType()),
        ]
    )
    idx = Index.for_name(
        "reserved_cols", schema=schema, format="parquet", spark=spark
    )
    for col in ("filename", "file_size", "_ariadne_seq"):
        with pytest.raises(ReservedColumnError):
            idx.add_index(col)
        with pytest.raises(ReservedColumnError):
            idx.add_bloom_index(col)
    idx.add_index("ok")


def test_bloom_fpr_validation(spark, storage):
    idx = Index.for_name(
        "fpr_valid", schema=EX_SCHEMA, format="parquet", spark=spark
    )
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(InvalidFprError):
            idx.add_bloom_index("id", fpr=bad)
    idx.add_bloom_index("id", fpr=0.001)


# ------------------------------------------------------------ empty-result schema

@pytest.fixture()
def typed_file(spark):
    out = f"{WORK}/empty_schema_src"
    if not os.path.isdir(out):
        rows = [
            (i, float(i), "active" if i % 2 else "closed",
             None, [{"id": i}, {"id": i + 100}])
            for i in range(1, 21)
        ]
        spark.createDataFrame(rows, EX_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(out)
    import glob

    return sorted(glob.glob(f"{out}/*.parquet"))


def _build(spark, name, files, register):
    idx = Index.for_name(name, schema=EX_SCHEMA, format="parquet", spark=spark)
    register(idx)
    idx.add_files(files).update()
    return idx


_EMPTY_SCHEMA_KINDS = {
    "regular": (lambda i: i.add_index("id"), "id"),
    "bloom": (lambda i: i.add_bloom_index("id"), "id"),
    "temporal": (lambda i: i.add_temporal_index("id", "updated_at"), "id"),
    "range": (lambda i: i.add_range_index("id"), "id"),
    "computed": (lambda i: i.add_computed_index("id2", "id + 0"), "id2"),
    "exploded": (lambda i: i.add_exploded_index("items", "iid", field="id"), "iid"),
}


@pytest.mark.parametrize("kind", sorted(_EMPTY_SCHEMA_KINDS))
def test_empty_result_schema_stable_across_types(spark, storage, typed_file, kind):
    register, col = _EMPTY_SCHEMA_KINDS[kind]
    idx = _build(spark, f"empty_{kind}", typed_file, register)
    idx.select("id", "status")
    matched = idx.join(
        spark.createDataFrame([(1,), (2,)], f"{col} int"), on=[col]
    )
    unmatched = idx.join(
        spark.createDataFrame([(999999,)], f"{col} int"), on=[col]
    )
    assert [f.name for f in unmatched.schema.fields] == [
        f.name for f in matched.schema.fields
    ]
    assert unmatched.count() == 0


def test_empty_result_schema_stable_reverse_direction(spark, storage, typed_file):
    import ariadne_spark

    idx = _build(spark, "empty_rev", typed_file, lambda i: i.add_index("id"))
    idx.select("id", "status")
    q = lambda ids: spark.createDataFrame([(i,) for i in ids], "id int")
    matched = ariadne_spark.join(q([1]), idx, on=["id"])
    unmatched = ariadne_spark.join(q([999999]), idx, on=["id"])
    assert [f.name for f in unmatched.schema.fields] == [
        f.name for f in matched.schema.fields
    ]


def test_outer_join_no_null_pad_of_unselected_columns(spark, storage, typed_file):
    import ariadne_spark

    idx = _build(spark, "empty_outer", typed_file, lambda i: i.add_index("id"))
    idx.select("id", "status")
    left = spark.createDataFrame([(999999,)], "id int")
    res = ariadne_spark.join(left, idx, on=["id"], how="left")
    assert [f.name for f in res.schema.fields] == ["id", "status"]
    assert res.count() == 1


# ------------------------------------------------------------ crash recovery

def test_orphan_segment_recovery_and_vacuum(spark, storage, typed_file):
    """Crash between segment write and manifest commit: the orphan is
    invisible to readers, a re-run converges to the same state, and
    vacuum removes the orphan directory."""
    idx = _build(spark, "crash_idx", typed_file, lambda i: i.add_index("id"))
    table = idx.table
    before = sorted(map(repr, table.read().collect()))
    n_segments = table.num_segments

    # simulate the crash: a segment directory exists, no manifest entry
    orphan_df = spark.createDataFrame([("ghost.parquet",)], "filename string")
    orphan_seg = table._write_segment(orphan_df)
    orphan_dir = f"{table.path}/{orphan_seg}"
    assert table.fs.exists(orphan_dir)

    # readers are unaffected (manifest never referenced the orphan)
    assert sorted(map(repr, table.read().collect())) == before
    assert table.num_segments == n_segments

    # re-running update is a no-op that stays deterministic
    idx.update()
    assert sorted(map(repr, table.read().collect())) == before

    # vacuum removes the unreferenced segment dir
    table.vacuum()
    assert not table.fs.exists(orphan_dir)


def test_interrupted_update_converges(spark, storage, typed_file):
    """An update that dies after committing SOME batches resumes from
    FileList-minus-index and lands in the identical end state."""
    files = typed_file
    a = Index.for_name("conv_a", schema=EX_SCHEMA, format="parquet", spark=spark)
    a.add_index("id").add_files(files)
    a.update()
    done = sorted(map(repr, a.table.read().drop("file_size").collect()))

    # "interrupted": index the file list in two separate update() calls
    b = Index.for_name("conv_b", schema=EX_SCHEMA, format="parquet", spark=spark)
    b.add_index("id").add_files(files[:1])
    b.update()  # partial state committed, "crash" here
    b.add_files(files)
    b.update()  # resume
    resumed = sorted(map(repr, b.table.read().drop("file_size").collect()))
    assert resumed == done


# ------------------------------------------------------------ lock depth

def _mklock(tmp_path, **kw):
    kw.setdefault("max_wait", 0.3)
    kw.setdefault("retry_interval", 0.05)
    return IndexLock(str(tmp_path), "t", **kw)


def test_lock_reacquire_after_release(tmp_path):
    lock = _mklock(tmp_path)
    c1 = lock.acquire()
    lock.release()
    c2 = lock.acquire()
    assert c1 != c2
    lock.release()


def test_lock_release_wrong_correlation_keeps_lock(tmp_path):
    a, b = _mklock(tmp_path), _mklock(tmp_path)
    a.acquire()
    b.correlation_id = "not-the-holder"
    b.release()  # must NOT delete a's file
    a.refresh()  # still held
    a.release()


def test_lock_refresh_wrong_correlation_raises(tmp_path):
    a, b = _mklock(tmp_path), _mklock(tmp_path)
    a.acquire()
    b.correlation_id = "not-the-holder"
    with pytest.raises(LockNotHeldError):
        b.refresh()
    # and the holder's heartbeat is untouched
    doc = json.loads(open(a.path).read())
    assert doc["correlationId"] == a.correlation_id
    a.release()


def test_lock_corrupt_file_healed(tmp_path):
    a = _mklock(tmp_path, timeout=0.1)
    os.makedirs(os.path.dirname(a.path), exist_ok=True)
    with open(a.path, "w") as fh:
        fh.write("{not json")
    corr = a.acquire()  # corrupt => stale => heal => acquire
    assert corr
    a.release()


def test_lock_contention_times_out(tmp_path):
    a = _mklock(tmp_path, timeout=60.0)
    b = _mklock(tmp_path, timeout=60.0, max_wait=0.25)
    a.acquire()
    t0 = time.monotonic()
    with pytest.raises(LockAcquisitionError):
        b.acquire()
    assert time.monotonic() - t0 >= 0.25
    a.release()


# ------------------------------------------------------------ bloom FPR

def test_bloom_filter_empirical_fpr():
    """Build a 1% filter over 1000 values; all present values hit and
    the measured FPR over 20k absent values stays near the target
    (reference BloomFilterOperationsTests.scala:219 verifies the
    mechanism; this pins the rate itself)."""
    from ariadne_spark.functions import bloom

    present = [f"user_{i}" for i in range(1000)]
    blob = bloom.build(present, fpr=0.01)
    assert all(bloom.might_contain(blob, v) for v in present)

    absent = [f"ghost_{i}" for i in range(20000)]
    hits = sum(bloom.might_contain(blob, v) for v in absent)
    measured = hits / len(absent)
    assert measured < 0.03, f"measured FPR {measured} >> configured 0.01"


def test_bloom_index_locates_present_never_misses(spark, storage, typed_file):
    """File-level guarantee: a present key ALWAYS locates its file
    (bloom has no false negatives)."""
    idx = _build(spark, "fpr_idx", typed_file, lambda i: i.add_bloom_index("id"))
    for key in (1, 10, 20):
        files = idx.locate_files({"id": [key]})
        assert files, f"present key {key} located no files"


# ------------------------------------------------------- small API parity

def test_has_file_membership(spark, storage, typed_file):
    """Index.has_file mirrors reference Index.scala:107 hasFile: the
    FileList membership check, with the same path normalization as
    add_files."""
    idx = _build(spark, "hasfile_idx", typed_file, lambda i: i.add_index("id"))
    assert idx.has_file(typed_file[0])
    assert not idx.has_file("/nonexistent/never-added.parquet")
    # normalization parity: the stored form and the raw form both hit
    from ariadne_spark.sources.files import normalize_path

    assert idx.has_file(normalize_path(typed_file[0]))


def test_indexes_property_unions_all_types(spark, storage, typed_file):
    """Index.indexes returns the union of indexed column names across
    every index type (reference Index.scala:372)."""
    idx = Index.for_name(
        "idxset_idx", schema=EX_SCHEMA, format="parquet", spark=spark
    )
    idx.add_index("id").add_range_index("value").add_bloom_index("status")
    assert idx.indexes == {"id", "value", "status"}


def test_vacuum_retention_protects_recent_history(spark, storage, typed_file):
    """Index.vacuum(retention_hours) parity with reference
    Index.scala:761: default 168 h keeps just-written history for
    pinned readers; retention 0 reclaims immediately."""
    import glob as _glob

    idx = _build(spark, "vac_ret_idx", typed_file, lambda i: i.add_index("id"))
    idx.add_files(typed_file).update()  # no-op update, but compact below
    idx.compact()
    before = _glob.glob(f"{storage}/**/indexes/**/data/**", recursive=True)
    idx.vacuum()  # default retention: young segments survive
    mid = _glob.glob(f"{storage}/**/indexes/**/data/**", recursive=True)
    assert len(mid) >= len(before) - 1
    idx.vacuum(retention_hours=0)
    after = _glob.glob(f"{storage}/**/indexes/**/data/**", recursive=True)
    assert len(after) <= len(mid)
