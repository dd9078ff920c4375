"""Source-file read pipeline.

S1-S3 of the reference's read path (reference:
src/main/scala/dev/cjfravel/ariadne/IndexFileOperations.scala:84-236):
read a set of csv/json/parquet/orc files with the persisted schema + read
options; apply computed columns (any Spark SQL expression) and
exploded-field aliases; tag every row with its source filename
(``input_file_name()`` with a single-file fallback, the
non-determinism noted at IndexFileOperations.scala:182-192); restrict
to a column selection. Empty file sets yield an empty DataFrame with
the exact same schema the populated path would produce — the
empty-result schema-stability rule (IndexJoinOperations.scala:146-154).

Everything here is declarative DataFrame code: Catalyst prunes columns
and pushes row-level predicates into the parquet scan for free; the
*file-level* pruning (which files to read at all) happens upstream in
plans/locate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..exceptions import UnsupportedFormatError
from ..storage.metadata import BLOOM, COMPUTED, EXPLODED, IndexConfig, IndexMetadata

SUPPORTED_FORMATS = ("csv", "json", "parquet", "orc")
FILENAME_COL = "_ariadne_filename"


def normalize_path(path: str) -> str:
    """Canonical filename key: scheme-less, URI-decoded absolute path.

    ``input_file_name()`` returns URI-encoded paths (spaces become
    %20), so both registration and tagging normalize through the same
    decoder or files with special characters would never match."""
    if path.startswith("file://"):
        path = path[len("file://"):]
    elif path.startswith("file:"):
        path = path[len("file:"):]
    if "%" in path:
        from urllib.parse import unquote

        path = unquote(path)
    return path


def read_base(
    spark: SparkSession,
    files: list[str],
    fmt: str,
    schema: StructType,
    read_options: dict | None = None,
) -> DataFrame:
    """S1: schema-enforced multi-file read; empty set => typed empty DF."""
    if fmt not in SUPPORTED_FORMATS:
        raise UnsupportedFormatError(fmt)
    if not files:
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema).options(**(read_options or {}))
    return reader.format(fmt).load(sorted(files))


def with_filename(df: DataFrame, files: list[str]) -> DataFrame:
    """S3: per-row source path. ``input_file_name()`` can return '' for
    driver-local single-file plans; fall back to the lone path."""
    if not files:
        return df.withColumn(FILENAME_COL, F.lit(None).cast("string"))
    # input_file_name() URI-encodes (space→%20, %→%25; literal '+'
    # stays '+'). Pre-escape '+' so url_decode (which maps '+'→' ')
    # round-trips exactly, then strip the scheme — values must match
    # registered normalize_path() names byte-for-byte.
    expr = F.input_file_name()
    expr = F.url_decode(F.regexp_replace(expr, r"\+", "%2B"))
    expr = F.regexp_replace(expr, "^file:/*", "/")
    if len(files) == 1:
        expr = F.when(F.length(expr) == 0, F.lit(normalize_path(files[0]))).otherwise(expr)
    return df.withColumn(FILENAME_COL, expr)


def _element_expr(cfg: IndexConfig) -> F.Column:
    """transform(arr, x -> x.f1.f2...) honoring dotted field paths."""
    def extract(x):
        if not cfg.field:
            return x
        out = x
        for part in cfg.field.split("."):
            out = out.getField(part)
        return out

    return F.transform(F.col(cfg.source_column), extract)


def apply_virtual_columns(
    df: DataFrame, configs: list[IndexConfig], explode_rows: bool = False
) -> DataFrame:
    """P2 + P3: attach computed columns and exploded-field aliases.

    ``explode_rows=False`` (build path): exploded aliases hold the
    *array* of extracted values — the build aggregates them with
    flatten/array_distinct in one shuffle instead of multiplying rows.
    ``explode_rows=True`` (data/join path): inner-explode into one row
    per element, matching the reference's read-time explode (null and
    empty arrays drop, IndexFileOperations.scala:229-236).
    """
    for cfg in configs:
        if cfg.type == COMPUTED:
            df = df.withColumn(cfg.column, F.expr(cfg.expression))
        elif cfg.type == EXPLODED:
            vals = _element_expr(cfg)
            if explode_rows:
                df = df.withColumn(cfg.column, F.explode(vals))
            else:
                df = df.withColumn(cfg.column, vals)
        elif cfg.type == BLOOM and cfg.expression is not None:
            # probe-only alias: reachable only from the BUILD path —
            # the data/join read (Index._read_data) filters virtuals
            # to computed/exploded, so the alias never widens user-
            # facing schemas
            df = df.withColumn(cfg.column, F.expr(cfg.expression))
    return df


def nested_root(column: str) -> str:
    """Top-level root of a possibly nested column path ('a.b.c' -> 'a')."""
    return column.split(".")[0]


def read_pipeline(
    spark: SparkSession,
    meta: IndexMetadata,
    files: list[str],
    virtual_configs: list[IndexConfig] | None = None,
    selection: list[str] | None = None,
    explode_rows: bool = True,
    tag_filename: bool = False,
) -> DataFrame:
    """S2: base read + virtual columns (+ filename tag) + selection."""
    df = read_base(spark, files, meta.format, meta.schema, meta.read_options)
    if tag_filename:
        df = with_filename(df, files)
    df = apply_virtual_columns(df, virtual_configs or [], explode_rows=explode_rows)
    if selection:
        keep = list(dict.fromkeys(selection))
        if tag_filename:
            keep.append(FILENAME_COL)
        df = df.select(*keep)
    return df
