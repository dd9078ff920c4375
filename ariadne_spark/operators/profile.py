"""One-pass table profiling: per-column row/null/distinct counts plus
type-appropriate extremes — the "what is in this lake table" primitive
(the reference exposes per-index ``stats()``; this is the same idea
generalized to any DataFrame, reference Index.scala stats surface).

Scale shape: ALL metrics for ALL columns come from a single
``df.agg(...)`` — one scan, one final 1-row reduce, no per-column
jobs. Distinct counts default to HyperLogLog (``approx_count_distinct``,
constant memory, mergeable — the only sane choice at 100 TB); pass
``exact=True`` to use exact two-phase distincts (Catalyst plans
multi-distinct via Expand, duplicating scan rows per distinct column —
affordable at audit time, not as a default). The 1-row wide result is
unpivoted driver-side (ncols rows — trivially small).

Numeric means are computed as exact integral/decimal sums divided by
counts where possible so the result is reproducible across partition
orders (a float ``avg`` is not associative-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    NumericType,
    ShortType,
    StringType,
)

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one pass.

    Output: one row per column with

    - ``column``      — column name,
    - ``n_rows``      — table row count,
    - ``n_nulls``     — null count for the column,
    - ``n_distinct``  — distinct non-null values (HLL unless ``exact``),
    - ``min_num`` / ``max_num`` / ``mean`` — DOUBLE extremes/mean for
      numeric columns (null otherwise); integral means are exact
      sum/count ratios,
    - ``min_str`` / ``max_str`` — string extremes for string columns.
    """
    names = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        dt = schema[c]
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nulls_{c}"))
        if exact:
            aggs.append(F.count_distinct(col).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        if isinstance(dt, NumericType):
            aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
            if isinstance(dt, _INTEGRAL) or isinstance(dt, DecimalType):
                # exact sum (long/decimal) over count: partition-order
                # independent, unlike a running float mean
                mean = (F.sum(col).cast("double") / F.count(col)).alias(
                    f"__mean_{c}"
                )
            else:
                mean = F.avg(col).alias(f"__mean_{c}")
            aggs.append(mean)
        elif isinstance(dt, StringType):
            aggs.append(F.min(col).alias(f"__smin_{c}"))
            aggs.append(F.max(col).alias(f"__smax_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()

    out_rows = []
    for c in names:
        out_rows.append(
            (
                c,
                row["__n"],
                row[f"__nulls_{c}"],
                row[f"__nd_{c}"],
                row.get(f"__min_{c}"),
                row.get(f"__max_{c}"),
                row.get(f"__mean_{c}"),
                row.get(f"__smin_{c}"),
                row.get(f"__smax_{c}"),
            )
        )
    spark = df.sparkSession
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        [
            StructField("column", StringType()),
            StructField("n_rows", LongType()),
            StructField("n_nulls", LongType()),
            StructField("n_distinct", LongType()),
            StructField("min_num", DoubleType()),
            StructField("max_num", DoubleType()),
            StructField("mean", DoubleType()),
            StructField("min_str", StringType()),
            StructField("max_str", StringType()),
        ]
    )
    return spark.createDataFrame(out_rows, out_schema)


def numeric_quantiles(
    df: DataFrame,
    columns: list[str] | None = None,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    exact: bool = False,
) -> DataFrame:
    """Per-column quantiles for numeric columns, ALL in one pass.

    Defaults to ``approx_percentile`` (t-digest-style sketch: one scan,
    mergeable, constant memory — the lake-scale path). ``exact=True``
    uses ``percentile`` (exact sort-based; linear-interpolated, which
    matches ANSI ``quantile_cont`` / DuckDB bit-for-bit on integral
    inputs) for audit-grade runs.

    Output: one row per column — (column, p_25, p_50, ... as DOUBLE).
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    names = [
        c
        for c in (columns or df.columns)
        if isinstance(schema[c], NumericType)
    ]
    arr = "array(" + ", ".join(f"{p}D" for p in probs) + ")"
    fn = "percentile" if exact else "approx_percentile"
    aggs = [
        F.expr(f"{fn}(cast(`{c}` as double), {arr})").alias(f"__q_{c}")
        for c in names
    ]
    row = df.agg(*aggs).collect()[0].asDict()
    out_rows = []
    for c in names:
        qs = row[f"__q_{c}"]
        out_rows.append((c, *(qs if qs is not None else [None] * len(probs))))
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        [StructField("column", StringType())]
        + [
            StructField(f"p_{str(p).replace('0.', '')}", DoubleType())
            for p in probs
        ]
    )
    return df.sparkSession.createDataFrame(out_rows, out_schema)


def profile_from_footers(
    spark, files: list[str], columns: list[str] | None = None
) -> DataFrame:
    """Table profile computed from parquet FOOTER metadata only — zero
    data scan. Per column: row count, null count (exact: parquet
    column-chunk metadata stores both), and min/max from column-chunk
    statistics (exact for numeric columns; string bounds may be
    truncated-wider; timestamp/date extremes are not surfaced in this
    profile — use the footer RANGE build or :func:`profile_table`).
    ``n_distinct`` is not derivable from footers and is omitted — use
    :func:`profile_table` (HLL) when you need it.

    Distributed one-footer-per-task, results reduced driver-side
    (bytes proportional to files × columns, never to rows). The
    100 TB story: a full-lake profile costs one KB-scale footer read
    per file.
    """

    def one_file(path: str):
        import pyarrow.parquet as pq

        local = path[len("file:"):] if path.startswith("file:") else path
        md = pq.ParquetFile(local).metadata
        out = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                c = g.column(i)
                name = c.path_in_schema
                st = c.statistics
                rows = g.num_rows
                nulls = st.null_count if st is not None else None
                mn = st.min if st is not None and st.has_min_max else None
                mx = st.max if st is not None and st.has_min_max else None
                pr = out.get(name)
                if pr is None:
                    out[name] = [rows, nulls, mn, mx]
                else:
                    pr[0] += rows
                    pr[1] = (
                        None if (pr[1] is None or nulls is None)
                        else pr[1] + nulls
                    )
                    if mn is not None and (pr[2] is None or mn < pr[2]):
                        pr[2] = mn
                    if mx is not None and (pr[3] is None or mx > pr[3]):
                        pr[3] = mx
        return out

    n_slices = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    parts = spark.sparkContext.parallelize(files, n_slices).map(one_file).collect()
    merged: dict = {}
    for part in parts:
        for name, (rows, nulls, mn, mx) in part.items():
            pr = merged.get(name)
            if pr is None:
                merged[name] = [rows, nulls, mn, mx]
            else:
                pr[0] += rows
                pr[1] = None if (pr[1] is None or nulls is None) else pr[1] + nulls
                if mn is not None and (pr[2] is None or mn < pr[2]):
                    pr[2] = mn
                if mx is not None and (pr[3] is None or mx > pr[3]):
                    pr[3] = mx

    from pyspark.sql.types import StructField, StructType

    names = columns or list(merged)
    rows_out = []
    for c in names:
        r = merged.get(c)
        if r is None:
            continue
        mn, mx = r[2], r[3]
        num_mn = float(mn) if isinstance(mn, (int, float)) else None
        num_mx = float(mx) if isinstance(mx, (int, float)) else None
        s_mn = mn if isinstance(mn, (str, bytes)) else None
        s_mx = mx if isinstance(mx, (str, bytes)) else None
        if isinstance(s_mn, bytes):
            s_mn = s_mn.decode("utf-8", "replace")
        if isinstance(s_mx, bytes):
            s_mx = s_mx.decode("utf-8", "replace")
        rows_out.append((c, r[0], r[1], num_mn, num_mx, s_mn, s_mx))
    out_schema = StructType(
        [
            StructField("column", StringType()),
            StructField("n_rows", LongType()),
            StructField("n_nulls", LongType()),
            StructField("min_num", DoubleType()),
            StructField("max_num", DoubleType()),
            StructField("min_str", StringType()),
            StructField("max_str", StringType()),
        ]
    )
    return spark.createDataFrame(rows_out, out_schema)


def heavy_hitters(
    df: DataFrame, column: str, k: int, capacity: int | None = None
) -> DataFrame:
    """All values of ``column`` occurring MORE than ``n/k`` times
    (n = non-null rows), with exact counts — ``(value, count)`` rows.

    Two-phase Misra-Gries: each partition streams its rows through a
    summary of ``capacity`` (default ``4*k``) counters — any value
    with partition frequency > partition_rows/capacity survives
    locally, and by pigeonhole every GLOBAL heavy hitter exceeds that
    threshold in at least one partition, so the union of local
    candidates is a guaranteed superset. Phase two semi-joins the
    (broadcast, <= capacity x partitions) candidate set back over the
    data and counts exactly, so the final groupBy shuffles only
    candidate-valued rows instead of every distinct value. n comes
    from the same pass as the candidates (a per-partition total row),
    not a separate count job.

    100 TB story: a full ``groupBy(column).count()`` over a
    high-cardinality column shuffles one record per distinct value;
    this shuffles one record per partition-candidate (bounded by
    ``capacity x partitions``) plus the candidate-matching rows of
    the exact pass. Memory per task is O(capacity). The Arrow batches
    are merged with vectorized ``value_counts`` — the per-batch trim
    is the only Python-side loop and runs over <= capacity + batch
    distincts.
    """
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    if k < 2:
        raise ValueError(f"heavy_hitters: k must be >= 2, got {k}")
    cap = int(capacity or 4 * k)
    if cap < k:
        raise ValueError(f"heavy_hitters: capacity {cap} < k {k}")
    src = df.select(F.col(column).cast("string").alias("v")).where(
        F.col("v").isNotNull()
    )

    out_schema = StructType(
        [
            StructField("v", StringType()),
            StructField("n", LongType()),
        ]
    )

    def mg(batches):
        counters: dict[str, int] = {}
        total = 0
        for pdf in batches:
            vc = pdf["v"].value_counts()
            total += int(vc.sum())
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                # Misra-Gries decrement: subtract the (cap+1)-th
                # largest count from everyone, drop non-positives —
                # any value with true partition frequency above
                # partition_rows/cap survives every trim
                cut = sorted(counters.values(), reverse=True)[cap]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        rows = [(v, int(c)) for v, c in counters.items()]
        rows.append((None, total))  # per-partition total marker
        yield pd.DataFrame(rows, columns=["v", "n"])

    local = src.mapInPandas(mg, schema=out_schema).cache()
    try:
        n_total = (
            local.where(F.col("v").isNull()).agg(F.sum("n")).collect()[0][0]
            or 0
        )
        if n_total == 0:
            return (
                src.limit(0)
                .select(
                    F.col("v").alias(column),
                    F.lit(0).cast("long").alias("count"),
                )
            )
        threshold = n_total / k
        cands = local.where(F.col("v").isNotNull()).select("v").distinct()
        exact = (
            src.join(F.broadcast(cands), "v", "left_semi")
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("count"))
            .where(F.col("count") > F.lit(threshold))
            .select(F.col("v").alias(column), "count")
        )
        # < k values can each exceed n/k, so the result is tiny BY
        # CONSTRUCTION — materialize it driver-side before releasing
        # the candidate cache (no lingering cache entry)
        rows = exact.collect()
        return df.sparkSession.createDataFrame(rows, exact.schema)
    finally:
        local.unpersist()
