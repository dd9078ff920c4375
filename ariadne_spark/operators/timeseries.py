"""Time-series operators: sessionization, time-bucket rollups, and
as-of joins.

The reference has no time-series operators of its own — its temporal
index exposes only "latest version per key" (reference:
src/main/scala/dev/cjfravel/ariadne/IndexJoinOperations.scala:303-337).
These extend that surface with the three shapes every event/telemetry
pipeline needs, each expressed as pure ``pyspark.sql.functions`` so the
whole plan stays inside Catalyst/whole-stage codegen — no Python UDFs.

Scale posture (100 TB):
- ``sessionize`` costs exactly ONE shuffle (hash by key) + one sort;
  the lag flag and the running session counter share a single window
  spec, so Catalyst plans one Exchange + one Sort for both.
- ``rollup`` is a plain partial-aggregated groupBy; with
  ``F.window`` buckets it is also valid under Structured Streaming
  (add a watermark upstream and the same code streams).
- ``asof_join`` is the sort-merge formulation: union both sides, one
  shuffle on the key, one sort on (ts, side), and a running
  ``last(..., ignorenulls)`` carries the most recent right-side row
  forward — no range join, no per-row probing, cost O(n log n) per
  key. Hot keys are bounded by per-key event volume (same bound as
  any per-key window); there is no cross-product term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "session_stats",
    "time_bucket",
    "rollup",
    "resample",
    "asof_join",
]


def _epoch_seconds(c: Column) -> Column:
    """Fractional epoch seconds for TIMESTAMP or TIMESTAMP_NTZ
    (NTZ casts through TIMESTAMP under the pinned session timezone)."""
    return c.cast("timestamp").cast("double")


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign a per-key 1-based ``session_seq`` that increments
    whenever the gap to the previous event exceeds ``gap_seconds``.

    Ordering within a key is (ts, tiebreak) — pass a unique
    ``tiebreak_col`` (e.g. an event id) to make results deterministic
    when timestamps collide.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    # Gap in seconds between this event and the previous one for the
    # same key; NULL (first event) starts a session.
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = _epoch_seconds(F.col(ts_col)) - _epoch_seconds(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap > F.lit(float(gap_seconds))), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(new_session).over(running))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session summary: start/end timestamps, event count, and
    (optionally) the sum of ``value_col``."""
    sess = sessionize(df, key_col, ts_col, gap_seconds, tiebreak_col)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    return sess.groupBy(key_col, "session_seq").agg(*aggs)


def time_bucket(ts_col: str | Column, width_seconds: int) -> Column:
    """Epoch-aligned fixed-width bucket start for a timestamp column.

    Uses ``F.window`` so the exact same expression is legal under
    Structured Streaming (and Spark can fold it into the scan
    projection in batch). Buckets align to the 1970-01-01 epoch.
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.window(c, f"{int(width_seconds)} seconds")["start"]


def rollup(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: fixed time
    buckets x optional dimensions, default count(*).

    One partial-aggregated shuffle; at lake scale pair with a
    date-partitioned source so the scan prunes to the queried window.
    """
    bucket = time_bucket(ts_col, width_seconds).alias("bucket_start")
    keys = [bucket] + [F.col(c) for c in (group_cols or [])]
    if not aggs:
        aggs = [F.count(F.lit(1)).alias("n_events")]
    return df.groupBy(*keys).agg(*aggs)


def resample(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    key_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    fill: str = "null",
) -> DataFrame:
    """Gap-filled rollup: a DENSE fixed-width time grid per key (every
    bucket between that key's first and last event), with missing
    buckets filled per ``fill``:

    * ``'null'`` — empty buckets carry null aggregates
    * ``'zero'`` — empty buckets carry 0 (counts/sums)
    * ``'prev'`` — forward-fill: each empty bucket repeats the most
      recent non-empty bucket's values (gauge/state semantics)

    Plan shape: one rollup shuffle (event-grain), then everything runs
    at BUCKET grain — a tiny per-key span agg, a ``sequence`` +
    ``explode`` grid (no cross join against a calendar table), an
    equi-join back on (key, bucket), and for ``'prev'`` one per-key
    window. Grid cardinality per key is span/width — callers pick the
    width; a key spanning years at 1-second width is a deliberate
    1e8-row request, not an accident of the plan.
    """
    if fill not in ("null", "zero", "prev"):
        raise ValueError(f"fill must be null|zero|prev, got {fill!r}")
    keys = list(key_cols or [])
    rolled = rollup(df, ts_col, width_seconds, keys, aggs)
    agg_cols = [c for c in rolled.columns if c != "bucket_start" and c not in keys]
    spans = rolled.groupBy(*[F.col(k) for k in keys]).agg(
        F.min("bucket_start").alias("__mn"),
        F.max("bucket_start").alias("__mx"),
    )
    step = F.expr(f"interval {int(width_seconds)} second")
    grid = spans.select(
        *keys,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), step)).alias(
            "bucket_start"
        ),
    )
    out = grid.join(rolled, keys + ["bucket_start"], "left")
    if fill == "zero":
        out = out.na.fill(0, subset=agg_cols)
    elif fill == "prev":
        w = (
            Window.partitionBy(*[F.col(k) for k in keys])
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.select(
            *keys,
            "bucket_start",
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                for c in agg_cols
            ],
        )
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    tiebreak_col: str | None = None,
    suffix: str = "_asof",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of (backward) join: for each left row, attach the latest
    right row with ``right.ts_col <= left.ts_col`` for the same key.

    Both inputs must share ``on`` + ``ts_col`` names. The matched
    right columns come back as ``{name}{suffix}`` (including the
    right timestamp as ``{ts_col}{suffix}``); unmatched left rows
    keep NULLs (left-outer as-of semantics — the shape pandas calls
    ``merge_asof`` and DuckDB calls ``ASOF LEFT JOIN``).

    Ties: a right row at exactly the left timestamp DOES match
    (inclusive); among right rows sharing (key, ts) the one with the
    greatest ``tiebreak_col`` wins — pass a unique id for
    deterministic output.

    ``tolerance_seconds`` nulls the match when the left row is more
    than that far ahead of the matched right row.

    Implementation: union both sides, ONE shuffle on the key, sort by
    (ts, side-marker, tiebreak) with right rows ordered before left
    rows at equal ts, then a running ``last(payload, ignorenulls)``
    carries the newest right payload forward onto each left row.
    """
    for c in on + [ts_col]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"asof_join: column {c!r} missing from an input")
    payload = "__ariadne_asof_payload"
    marker = "__ariadne_asof_is_left"
    struct_fields = [F.col(ts_col).alias(ts_col)] + [
        F.col(c).alias(c) for c in right_cols
    ]
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.struct(*struct_fields).alias(payload),
        F.lit(0).alias(marker),
        *(
            [F.col(tiebreak_col).alias("__ariadne_asof_tb")]
            if tiebreak_col
            else [F.lit(0).alias("__ariadne_asof_tb")]
        ),
    )
    # The tiebreak only orders right rows among themselves (left rows
    # always sort after every right row at the same ts), so it need
    # not exist on the left side.
    tb_type = r.schema["__ariadne_asof_tb"].dataType
    l = left.select(
        "*",
        F.lit(None).cast(r.schema[payload].dataType).alias(payload),
        F.lit(1).alias(marker),
        F.lit(None).cast(tb_type).alias("__ariadne_asof_tb"),
    )
    unioned = l.select(r.columns + [c for c in l.columns if c not in r.columns])
    unioned = unioned.unionByName(
        r.select(
            r.columns
            + [
                F.lit(None).cast(l.schema[c].dataType).alias(c)
                for c in l.columns
                if c not in r.columns
            ]
        )
    )
    # Right rows sort before left rows at equal ts so an exact-ts
    # match is visible to the left row; among right ties the largest
    # tiebreak sorts last and wins the running last().
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col(marker).asc(),
            F.col("__ariadne_asof_tb").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        payload, F.last(payload, ignorenulls=True).over(w)
    )
    out = carried.where(F.col(marker) == 1)
    matched = F.col(payload)
    if tolerance_seconds is not None:
        in_tol = (
            _epoch_seconds(F.col(ts_col)) - _epoch_seconds(matched[ts_col])
        ) <= F.lit(float(tolerance_seconds))
        matched = F.when(matched.isNotNull() & in_tol, F.col(payload))
    cols = [F.col(c) for c in left.columns]
    cols.append(matched[ts_col].alias(f"{ts_col}{suffix}"))
    for c in right_cols:
        cols.append(matched[c].alias(f"{c}{suffix}"))
    return out.select(*cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_seconds: int | None = None,
    end_inclusive: bool = False,
    suffix: str = "_iv",
) -> DataFrame:
    """Point-in-interval join: pair each point row with every interval
    row satisfying ``start <= ts < end`` (``<= end`` with
    ``end_inclusive``) and, when ``on`` is given, matching those equi
    keys too. Overlapping intervals emit one output row per
    containing interval. Interval columns come back suffixed.

    Spark executes a bare inequality join as a nested loop —
    O(points x intervals) comparisons, the classic scale cliff. This
    plans it as an EQUI-join instead: intervals explode to the time
    grid cells they span (``bucket_seconds`` wide), points map to
    exactly one cell, and the join runs on (keys..., cell) with the
    exact containment predicate as a residual filter. A point lives
    in one cell, so every qualifying pair meets exactly once — no
    dedup pass. Cost is interval_rows x avg_cells_per_interval
    exploded rows; ``bucket_seconds`` defaults to the average
    interval length (one agg job), the classic ~2-cells-per-interval
    sweet spot. Skewed cells (a hot hour) split via AQE like any
    equi-join shuffle.
    """
    on = list(on or [])
    for c in on + [ts_col]:
        if c not in points.columns:
            raise ValueError(f"interval_join: {c!r} missing from points")
    for c in on + [start_col, end_col]:
        if c not in intervals.columns:
            raise ValueError(f"interval_join: {c!r} missing from intervals")
    s, e = _epoch_seconds(F.col(start_col)), _epoch_seconds(F.col(end_col))
    if bucket_seconds is None:
        avg = intervals.agg(F.avg(e - s)).collect()[0][0]
        bucket_seconds = max(1, int(avg or 1))
    w = F.lit(int(bucket_seconds))
    cell_l = F.floor(_epoch_seconds(F.col(ts_col)) / w)
    # sequence over cell ids is (len/bucket + 2)-long at most; empty
    # or inverted intervals (end before start) emit no cells
    cells = F.when(
        e >= s, F.sequence(F.floor(s / w), F.floor(e / w))
    ).otherwise(F.array())
    ivc = [c for c in intervals.columns]
    r = intervals.select(
        *[F.col(c).alias(f"{c}{suffix}" if c not in on else c) for c in ivc],
        F.explode(cells).alias("__ariadne_cell"),
    )
    l = points.withColumn("__ariadne_cell", cell_l)
    s_r = _epoch_seconds(F.col(f"{start_col}{suffix}"))
    e_r = _epoch_seconds(F.col(f"{end_col}{suffix}"))
    ts_l = _epoch_seconds(F.col(ts_col))
    contain = (ts_l >= s_r) & (
        (ts_l <= e_r) if end_inclusive else (ts_l < e_r)
    )
    return l.join(r, on + ["__ariadne_cell"], "inner").where(contain).drop(
        "__ariadne_cell"
    )
