"""Persisted read options + format behaviors (reference category:
IndexFileOperationsTests — formats, read options)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from ariadne_spark import Index
from ariadne_spark.exceptions import (
    FormatMismatchError,
    MissingFormatError,
    SchemaNotProvidedError,
    UnsupportedFormatError,
)

from .conftest import WORK, assert_same_rows


@pytest.fixture(scope="module")
def piped_csv(spark):
    """Nation as pipe-delimited headerless csv, two files."""
    out = f"{WORK}/nation_piped"
    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    if not os.path.isdir(out):
        for i in range(2):
            (
                df.where((F.col("n_nationkey") % 2) == i)
                .coalesce(1)
                .write.mode("overwrite")
                .option("header", "false")
                .option("delimiter", "|")
                .csv(f"{out}/part{i}")
            )
    return df, sorted(glob.glob(f"{out}/part*/*.csv"))


def test_csv_delimiter_options_persisted(spark, storage, piped_csv):
    df, files = piped_csv
    idx = Index.for_name(
        "nation_piped",
        schema=df.schema,
        format="csv",
        read_options={"header": "false", "delimiter": "|"},
        spark=spark,
    )
    idx.add_index("n_regionkey").add_files(files).update()
    # reconnect WITHOUT options: they must come from metadata
    idx2 = Index.for_name("nation_piped", spark=spark)
    assert idx2.meta.read_options == {"header": "false", "delimiter": "|"}
    res = idx2.read_matching({"n_regionkey": [1]})
    assert_same_rows(res, df.where(F.col("n_regionkey") == 1))


def test_read_options_merge_new_wins(spark, storage, piped_csv):
    df, files = piped_csv
    Index.for_name(
        "nation_opts", schema=df.schema, format="csv",
        read_options={"header": "false", "delimiter": "|"}, spark=spark,
    )
    idx = Index.for_name(
        "nation_opts", read_options={"delimiter": ","}, spark=spark
    )
    assert idx.meta.read_options == {"header": "false", "delimiter": ","}


def test_format_rules(spark, storage, piped_csv):
    df, _ = piped_csv
    with pytest.raises(SchemaNotProvidedError):
        Index.for_name("brand_new", spark=spark)
    with pytest.raises(MissingFormatError):
        Index.for_name("brand_new", schema=df.schema, spark=spark)
    with pytest.raises(UnsupportedFormatError):
        Index.for_name("brand_new", schema=df.schema, format="avro", spark=spark)
    Index.for_name("fmt_fixed", schema=df.schema, format="csv", spark=spark)
    with pytest.raises(FormatMismatchError):
        Index.for_name("fmt_fixed", format="parquet", spark=spark)


def test_multiline_json_exploded_array(spark, storage):
    """multiLine JSON with array<struct> + exploded-field index
    (reference fixtures: array_test.json with multiLine=true)."""
    import json as _json

    data = [
        {"event_id": "e1", "users": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]},
        {"event_id": "e2", "users": [{"id": 2, "name": "b"}, {"id": 3, "name": "c"}]},
        {"event_id": "e3", "users": [{"id": 9, "name": "z"}]},
    ]
    os.makedirs(f"{WORK}/mljson", exist_ok=True)
    files = []
    for i, chunk in enumerate([data[:2], data[2:]]):
        p = f"{WORK}/mljson/part{i}.json"
        with open(p, "w") as fh:
            _json.dump(chunk, fh, indent=2)
        files.append(p)
    schema = (
        "event_id string, users array<struct<id: bigint, name: string>>"
    )
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    idx = Index.for_name(
        "mljson", schema=st, format="json",
        read_options={"multiLine": "true"}, spark=spark,
    )
    idx.add_exploded_index("users", as_column="user_id", field="id")
    idx.add_files(files).update()
    res = idx.read_matching({"user_id": [2]})
    assert {r["event_id"] for r in res.collect()} == {"e1", "e2"}
    assert set(idx.locate_files({"user_id": [9]})) == {files[1]}


def test_orc_end_to_end(spark, storage, tmp_path):
    """ORC source format (beyond-reference breadth): index build,
    pruned read, and pruned join all match the raw DataFrame."""
    import glob

    from pyspark.sql import functions as F

    from ariadne_spark import Index

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") * 2.5).alias("x"),
    )
    files = []
    for i in range(3):
        out = str(tmp_path / f"orc{i}")
        df.where((F.col("k") % 3) == i).coalesce(1).write.mode(
            "overwrite"
        ).orc(out)
        files += glob.glob(f"{out}/*.orc")
    idx = Index.for_name("orc_e2e", schema=df.schema, format="orc", spark=spark)
    idx.add_index("g")
    idx.add_files(files).update()
    got = idx.read_matching({"g": [2, 5]})
    exp = df.where(F.col("g").isin(2, 5))
    assert sorted(tuple(r) for r in got.select("k", "g", "x").collect()) == sorted(
        tuple(r) for r in exp.collect()
    )
    keys = spark.createDataFrame([(2,), (7,)], ["g"])
    j = idx.join(keys, on=["g"])
    ej = df.join(keys, "g")
    assert j.count() == ej.count()
