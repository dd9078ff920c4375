"""IndexCatalog — global directory of indexes under the storage path
(reference: src/main/scala/dev/cjfravel/ariadne/IndexCatalog.scala:77-420).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import context
from .exceptions import IndexNotFoundError
from .index import Index
from .storage.fs import get_fs
from .storage.metadata import load_metadata
from .storage.paths import IndexPaths, indexes_root


def _root(spark: SparkSession) -> str:
    return indexes_root(context.AriadneConf.load(spark).storage_path)


def list_indexes(spark: SparkSession | None = None) -> list[str]:
    spark = spark or context.get_spark()
    root = _root(spark)
    fs = get_fs(spark, root)
    out = []
    for name in fs.list_names(root):
        if fs.exists(f"{root}/{name}/metadata.json"):
            out.append(name)
    return out


def exists(name: str, spark: SparkSession | None = None) -> bool:
    return name in list_indexes(spark)


def get(name: str, spark: SparkSession | None = None) -> Index:
    spark = spark or context.get_spark()
    if not exists(name, spark):
        raise IndexNotFoundError(name)
    return Index.for_name(name, spark=spark)


def remove(name: str, spark: SparkSession | None = None) -> None:
    get(name, spark).drop_storage()


def describe(name: str, spark: SparkSession | None = None) -> DataFrame:
    """One row per configured index column."""
    spark = spark or context.get_spark()
    idx = get(name, spark)
    schema = T.StructType(
        [
            T.StructField("index", T.StringType()),
            T.StructField("column", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("detail", T.StringType()),
            T.StructField("num_files", T.LongType()),
        ]
    )
    n_files = idx.files.count()
    rows = []
    for cfg in idx.meta.indexes:
        detail = (
            cfg.expression
            or (f"{cfg.source_column}[].{cfg.field}" if cfg.source_column else None)
            or cfg.timestamp_column
            or (f"fpr={cfg.fpr}" if cfg.fpr else None)
            or ""
        )
        rows.append((name, cfg.column, cfg.type, detail, n_files))
    if not rows:
        rows = [(name, None, None, "", n_files)]
    return spark.createDataFrame(rows, schema)


def describe_all(spark: SparkSession | None = None) -> DataFrame:
    spark = spark or context.get_spark()
    dfs = [describe(n, spark) for n in list_indexes(spark)]
    if not dfs:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("index", T.StringType()),
                    T.StructField("column", T.StringType()),
                    T.StructField("type", T.StringType()),
                    T.StructField("detail", T.StringType()),
                    T.StructField("num_files", T.LongType()),
                ]
            ),
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def find_indexes(column: str, spark: SparkSession | None = None) -> list[str]:
    """Indexes that have an index on ``column``."""
    spark = spark or context.get_spark()
    conf = context.AriadneConf.load(spark)
    out = []
    for name in list_indexes(spark):
        meta = load_metadata(IndexPaths(conf.storage_path, name).metadata, name)
        if meta and meta.config_for(column) is not None:
            out.append(name)
    return out
