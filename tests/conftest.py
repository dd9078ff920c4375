"""Shared Spark session + multi-file fixtures over /root/testdata.

Mirrors the reference's shared local-mode session pattern
(reference: src/test/scala/dev/cjfravel/ariadne/SparkTests.scala:28-66)
with a per-test fresh storagePath.
"""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import uuid

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
WORK = "/tmp/ariadne_tests"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        # test fixtures are KBs — keep bloom probing deterministic
        # instead of cost-model-skipped (the 32 MiB default floor)
        .config("spark.ariadne.minBloomPruneBytes", "0")
        .appName("ariadne-tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def storage(spark):
    path = f"{WORK}/store-{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.ariadne.storagePath", path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _split(spark, df, col_expr, n, out_dir) -> list[str]:
    """Write df as n single parquet files bucketed by col_expr ranges."""
    if os.path.isdir(out_dir):
        return sorted(glob.glob(f"{out_dir}/part*/*.parquet"))
    for i in range(n):
        part = df.where((col_expr % n) == i)
        part.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/part{i}")
    return sorted(glob.glob(f"{out_dir}/part*/*.parquet"))


@pytest.fixture(scope="session")
def orders_files(spark):
    """Orders split into 4 files by contiguous o_orderkey range — each
    file owns a disjoint key range, so pruning is observable."""
    out = f"{WORK}/orders_by_key"
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return df, _split_ranges(spark, df, "o_orderkey", 4, out)


def _split_ranges(spark, df, col, n, out_dir) -> list[str]:
    if os.path.isdir(out_dir):
        return sorted(glob.glob(f"{out_dir}/part*/*.parquet"))
    lo, hi = df.agg(F.min(col), F.max(col)).collect()[0]
    if isinstance(lo, datetime.datetime):
        width = (hi - lo) / n + datetime.timedelta(microseconds=1)
    else:
        width = ((hi - lo) // n) + 1
    for i in range(n):
        part = df.where(
            (F.col(col) >= lo + i * width) & (F.col(col) < lo + (i + 1) * width)
        )
        part.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/part{i}")
    return sorted(glob.glob(f"{out_dir}/part*/*.parquet"))


@pytest.fixture(scope="session")
def events_files(spark):
    """Events split into 4 files by time quartile (temporal tests)."""
    out = f"{WORK}/events_by_time"
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return df, _split_ranges(spark, df, "ts", 4, out)


@pytest.fixture(scope="session")
def tagged_files(spark):
    """Synthetic array-of-struct table for exploded-field indexes."""
    out = f"{WORK}/tagged"
    if not os.path.isdir(out):
        rows = []
        for i in range(60):
            tags = [
                {"k": f"key{(i + j) % 10}", "v": (i * 7 + j) % 5}
                for j in range(1 + i % 3)
            ]
            rows.append((i, f"name{i}", tags))
        df = spark.createDataFrame(
            rows,
            "id long, name string, tags array<struct<k: string, v: long>>",
        )
        for p in range(3):
            df.where((F.col("id") % 3) == p).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{out}/part{p}")
    files = sorted(glob.glob(f"{out}/part*/*.parquet"))
    return (
        spark.read.parquet(*[os.path.dirname(f) for f in files]),
        files,
    )


def rows_set(df, *cols):
    sel = df.select(*cols) if cols else df
    return set(map(tuple, sel.collect()))


def assert_same_rows(a, b, *cols):
    ra, rb = rows_set(a, *cols), rows_set(b, *cols)
    assert ra == rb, f"row sets differ: only_left={list(ra - rb)[:5]} only_right={list(rb - ra)[:5]}"
