"""Per-index-type build + locate + join correctness against plain
Spark answers (reference categories: IndexBuildOperationsTests,
RangeIndexTests, TemporalIndexTests, BloomFilterOperationsTests,
MultiColumnIntersectTests, IndexTypeExclusivityTests)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ariadne_spark import Index
from ariadne_spark.exceptions import IndexTypeConflictError, NotArrayColumnError
from ariadne_spark.functions import bloom as bloomfn
from ariadne_spark.sources.files import normalize_path

from .conftest import assert_same_rows


def _files_containing(df, files, col, values):
    """Ground truth: which files actually hold rows with col ∈ values."""
    out = set()
    for f in files:
        import pyarrow.parquet as pq

        tbl = pq.read_table(f, columns=[col])
        have = set(tbl[col].to_pylist())
        if have & set(values):
            out.add(normalize_path(f))
    return out


def test_regular_index_locates_exactly(spark, storage, orders_files):
    df, files = orders_files
    idx = Index.for_name("o_reg", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_orderkey").add_files(files).update()
    values = [1, 7, 3000]
    located = set(idx.locate_files({"o_orderkey": values}))
    truth = _files_containing(df, files, "o_orderkey", values)
    assert located == truth
    assert len(located) < len(files)  # actually pruned something


def test_computed_index(spark, storage, orders_files):
    df, files = orders_files
    idx = Index.for_name("o_comp", schema=df.schema, format="parquet", spark=spark)
    idx.add_computed_index("order_month", "month(o_orderdate)")
    idx.add_files(files).update()
    res = idx.read_matching({"order_month": [3]})
    expected = df.withColumn("order_month", F.expr("month(o_orderdate)")).where(
        F.col("order_month") == 3
    )
    assert_same_rows(res.select("o_orderkey"), expected.select("o_orderkey"))


def test_range_index_prunes_and_matches(spark, storage, orders_files):
    df, files = orders_files
    idx = Index.for_name("o_rng", schema=df.schema, format="parquet", spark=spark)
    idx.add_range_index("o_orderkey").add_files(files).update()
    values = [5, 6, 7]
    located = set(idx.locate_files({"o_orderkey": values}))
    # files are split by contiguous orderkey range => exactly one file
    # can contain keys 5..7
    assert len(located) == 1
    res = idx.read_matching({"o_orderkey": values})
    assert_same_rows(
        res.select("o_orderkey"),
        df.where(F.col("o_orderkey").isin(values)).select("o_orderkey"),
    )


def test_range_bounding_box_degradation(spark, storage, orders_files):
    """>1000 distinct values degrade to a min/max bounding box —
    conservative (may admit files) but never loses a match."""
    df, files = orders_files
    idx = Index.for_name("o_rng2", schema=df.schema, format="parquet", spark=spark)
    idx.add_range_index("o_orderkey").add_files(files).update()
    values = list(range(0, 1300))
    located = set(idx.locate_files({"o_orderkey": values}))
    truth = _files_containing(df, files, "o_orderkey", values)
    assert located >= truth


@pytest.mark.slow
def test_bloom_index_join(spark, storage, orders_files):
    df, files = orders_files
    idx = Index.for_name("o_blm", schema=df.schema, format="parquet", spark=spark)
    idx.add_bloom_index("o_orderkey", fpr=0.01).add_files(files).update()
    keys = spark.createDataFrame([(5,), (6,), (2999,)], ["o_orderkey"])
    res = idx.join(keys, on=["o_orderkey"])
    expected = df.join(keys, ["o_orderkey"])
    assert_same_rows(res, expected)
    # bloom pruning located a strict subset (keys live in ≤2 of 4 files)
    located = idx.locate_files(keys, columns=["o_orderkey"])
    assert len(located) < len(files)


def test_bloom_expression_index_over_derived_array_keys(
    spark, storage, orders_files
):
    """r09: a bloom index over a build-time EXPRESSION whose value is
    an array blooms the distinct ELEMENTS — files prune on derived
    keys the rows never store. Here each row derives two bucket tags
    from o_orderkey; probing one tag locates only the files whose key
    range produces it, and the alias never appears in read output."""
    df, files = orders_files
    lo, hi = df.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    width = ((hi - lo) // 4) + 1
    expr = (
        f"array(floor((o_orderkey - {lo}) / {width}), "
        f"1000 + floor((o_orderkey - {lo}) / {width}))"
    )
    idx = Index.for_name(
        "o_blm_expr", schema=df.schema, format="parquet", spark=spark
    )
    idx.add_bloom_index("okbucket", fpr=1e-6, expression=expr)
    idx.add_files(files).update()
    # bucket 0 lives only in file 0 (contiguous range split)
    located = idx.locate_files({"okbucket": [0]})
    assert len(located) == 1
    # both derived element families probe the same bloom
    located2 = idx.locate_files({"okbucket": [1002]})
    assert len(located2) == 1
    # conjunction with an impossible tag -> empty
    assert idx.locate_files({"okbucket": [999999]}) == []
    # the alias is probe-only: no okbucket column in reads
    assert "okbucket" not in idx.read_all().columns
    # alias collision with a source column is refused
    bad = Index.for_name(
        "o_blm_expr_bad", schema=df.schema, format="parquet", spark=spark
    )
    with pytest.raises(IndexTypeConflictError):
        bad.add_bloom_index("o_orderkey", expression="array(1)")


@pytest.mark.slow
def test_bloom_prune_beyond_collect_cap(spark, storage, orders_files):
    """>100k distinct join keys (the old driver-collect cap) must still
    prune: values are digested executor-side and only 16-byte hash
    pairs reach the driver. With a tight fpr the absent-key probes
    stay negative, so files owning disjoint key ranges are pruned —
    previously this silently fell back to a full scan."""
    df, files = orders_files
    idx = Index.for_name("o_blm_big", schema=df.schema, format="parquet", spark=spark)
    idx.add_bloom_index("o_orderkey", fpr=1e-8).add_files(files).update()
    lo, hi = df.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    width = ((hi - lo) // 4) + 1
    # all keys of file 0's range, padded with >100k absent keys
    keys = spark.range(lo, lo + width).select(
        F.col("id").alias("o_orderkey")
    ).unionByName(
        spark.range(hi + 1_000_000, hi + 1_150_000).select(
            F.col("id").alias("o_orderkey")
        )
    )
    located = idx.locate_files(keys, columns=["o_orderkey"])
    assert 0 < len(located) < len(files)  # pruned, not a full scan
    assert not any(
        v.get("skipped") for v in idx._last_locate_stats.per_column.values()
    )
    res = idx.join(keys, on=["o_orderkey"])
    expected = df.join(keys, ["o_orderkey"])
    assert_same_rows(res, expected)


def test_bloom_fpr_acceptable():
    """Empirical FPR stays near target (reference:
    BloomFilterOperationsTests.scala:219)."""
    blob = bloomfn.build(list(range(5000)), fpr=0.01)
    false_pos = sum(
        1 for v in range(5000, 15000) if bloomfn.might_contain(blob, v)
    )
    assert false_pos / 10000 < 0.03
    # no false negatives, ever
    assert all(bloomfn.might_contain(blob, v) for v in range(0, 5000, 97))


@pytest.mark.slow
def test_temporal_index_latest_version(spark, storage, events_files):
    df, files = events_files
    idx = Index.for_name("ev_tmp", schema=df.schema, format="parquet", spark=spark)
    idx.add_temporal_index("user_id", "ts").add_files(files).update()
    users = spark.createDataFrame([(i,) for i in range(0, 10)], ["user_id"])
    res = idx.join(users, on=["user_id"])
    # oracle: latest event per user, computed on the full data
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc_nulls_last())
    expected = (
        df.join(users, ["user_id"])
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .drop("rn")
    )
    assert_same_rows(res, expected)
    # temporal pruning: only files holding the latest version per user
    located = idx.locate_files(users, columns=["user_id"])
    assert len(located) < len(files)


@pytest.mark.slow
def test_exploded_index(spark, storage, tagged_files):
    df, files = tagged_files
    idx = Index.for_name("tags", schema=df.schema, format="parquet", spark=spark)
    idx.add_exploded_index("tags", as_column="tag_key", field="k")
    idx.add_files(files).update()
    res = idx.read_matching({"tag_key": ["key3"]})
    expected = (
        df.withColumn("tag_key", F.explode(F.transform("tags", lambda x: x["k"])))
        .where(F.col("tag_key") == "key3")
    )
    assert_same_rows(res.select("id", "tag_key"), expected.select("id", "tag_key"))


def test_multi_column_and_intersection(spark, storage, orders_files):
    """AND semantics across columns and index types (reference:
    MultiColumnIntersectTests, MixedIndexIntersectionTests)."""
    df, files = orders_files
    idx = Index.for_name("o_multi", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey").add_range_index("o_orderkey")
    idx.add_files(files).update()
    some = df.limit(5).collect()
    q = {
        "o_custkey": [r["o_custkey"] for r in some],
        "o_orderkey": [r["o_orderkey"] for r in some],
    }
    located = set(idx.locate_files(q))
    t1 = _files_containing(df, files, "o_custkey", q["o_custkey"])
    t2 = _files_containing(df, files, "o_orderkey", q["o_orderkey"])
    assert located <= (t1 & t2)
    res = idx.read_matching(q)
    expected = df.where(
        F.col("o_custkey").isin(q["o_custkey"])
        & F.col("o_orderkey").isin(q["o_orderkey"])
    )
    assert_same_rows(res, expected)


def test_index_type_exclusivity(spark, storage, orders_files):
    df, _ = orders_files
    idx = Index.for_name("o_excl", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey")
    with pytest.raises(IndexTypeConflictError):
        idx.add_bloom_index("o_custkey")
    with pytest.raises(IndexTypeConflictError):
        idx.add_range_index("o_custkey")
    idx.add_index("o_custkey")  # same registration is idempotent
    with pytest.raises(NotArrayColumnError):
        idx.add_exploded_index("o_orderstatus", as_column="x")
    with pytest.raises(IndexTypeConflictError):
        idx.add_computed_index("o_totalprice", "1+1")  # collides with source col


@pytest.mark.slow
def test_exploded_index_does_not_multiply_other_joins(spark, storage, tagged_files):
    """An index carrying an exploded config must NOT explode (and so
    duplicate) rows when the query targets a different column."""
    df, files = tagged_files
    idx = Index.for_name("tags_mix", schema=df.schema, format="parquet", spark=spark)
    idx.add_exploded_index("tags", as_column="tag_key", field="k")
    idx.add_index("id")
    idx.add_files(files).update()
    keys = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    res = idx.join(keys, on=["id"])
    assert "tag_key" not in res.columns  # alias not materialized
    assert res.count() == 10  # one row per id — no explode blow-up
    # but the exploded alias still answers its own queries
    r2 = idx.read_matching({"tag_key": ["key3"]})
    assert r2.where(F.col("tag_key") != "key3").count() == 0 and r2.count() > 0


@pytest.mark.slow
def test_two_exploded_fields_same_array_no_collision(spark, storage, tagged_files):
    """Two exploded-field indexes from the SAME array column must not
    collide (reference regression BugFixTests H2)."""
    df, files = tagged_files
    idx = Index.for_name("tags_two", schema=df.schema, format="parquet", spark=spark)
    idx.add_exploded_index("tags", as_column="tag_key", field="k")
    idx.add_exploded_index("tags", as_column="tag_val", field="v")
    idx.add_files(files).update()
    main = idx.index_df
    assert "tag_key" in main.columns and "tag_val" in main.columns
    rk = idx.read_matching({"tag_key": ["key1"]})
    rv = idx.read_matching({"tag_val": [2]})
    expected_k = df.withColumn(
        "tag_key", F.explode(F.transform("tags", lambda x: x["k"]))
    ).where("tag_key = 'key1'")
    expected_v = df.withColumn(
        "tag_val", F.explode(F.transform("tags", lambda x: x["v"]))
    ).where("tag_val = 2")
    assert_same_rows(rk.select("id", "tag_key"), expected_k.select("id", "tag_key"))
    assert_same_rows(rv.select("id", "tag_val"), expected_v.select("id", "tag_val"))


@pytest.mark.slow
def test_temporal_null_timestamps_rank_last(spark, storage):
    """Rows with null timestamps lose to any timestamped row
    (reference: TemporalIndexTests.scala:295)."""
    import glob as _glob

    rows = [
        (1, 100.0, "2024-01-15 10:00:00"),
        (1, 200.0, None),
        (2, 300.0, None),
    ]
    df = spark.createDataFrame(rows, "Id int, Value double, UpdatedAt string").select(
        "Id", "Value", F.col("UpdatedAt").cast("timestamp").alias("UpdatedAt")
    )
    base = f"{storage}/tnull"
    for i in range(2):
        df.where((F.col("Id") % 2) == i).coalesce(1).write.mode("overwrite").parquet(f"{base}/p{i}")
    files = sorted(_glob.glob(f"{base}/p*/*.parquet"))
    idx = Index.for_name("tnull", schema=df.schema, format="parquet", spark=spark)
    idx.add_temporal_index("Id", "UpdatedAt").add_files(files).update()
    res = idx.join(spark.createDataFrame([(1,), (2,)], ["Id"]), on=["Id"])
    got = {(r["Id"], r["Value"]) for r in res.collect()}
    # Id=1: timestamped row wins over null; Id=2: null-only row still returned
    assert got == {(1, 100.0), (2, 300.0)}


@pytest.mark.slow
def test_temporal_nested_timestamp_column(spark, storage):
    """Temporal timestamp columns may be nested (e.g. meta.updatedAt —
    reference: Index.scala:443-470)."""
    import glob as _glob

    rows = [
        (1, 10.0, ("2024-01-01 00:00:00",)),
        (1, 20.0, ("2024-02-01 00:00:00",)),
        (2, 30.0, ("2024-03-01 00:00:00",)),
    ]
    df = spark.createDataFrame(
        rows, "Id int, Value double, meta struct<updatedAt: string>"
    ).select(
        "Id", "Value",
        F.struct(F.col("meta.updatedAt").cast("timestamp").alias("updatedAt")).alias("meta"),
    )
    base = f"{storage}/tnested"
    for i in range(2):
        df.where((F.col("Id") % 2) == i).coalesce(1).write.mode("overwrite").parquet(f"{base}/p{i}")
    files = sorted(_glob.glob(f"{base}/p*/*.parquet"))
    idx = Index.for_name("tnested", schema=df.schema, format="parquet", spark=spark)
    idx.add_temporal_index("Id", "meta.updatedAt").add_files(files).update()
    res = idx.join(spark.createDataFrame([(1,), (2,)], ["Id"]), on=["Id"])
    got = {(r["Id"], r["Value"]) for r in res.collect()}
    assert got == {(1, 20.0), (2, 30.0)}

def test_temporal_dedup_maxby_matches_window_form(spark):
    """The single-config max_by groupBy path (r05 verdict #4: skew-safe,
    partial-aggregatable) returns EXACTLY the window row_number==1 rows
    — including null-timestamps-last and all-null keys — and its plan
    shows map-side partial aggregation (no per-key serialization)."""
    import random

    from pyspark.sql import Window

    from ariadne_spark.operators.join import apply_temporal_dedup
    from ariadne_spark.storage.metadata import TEMPORAL, IndexConfig

    rnd = random.Random(7)
    rows = []
    seq = 0
    for key in range(40):
        used_null = False  # ≥2 null-ts rows per key would tie (both
        for _ in range(rnd.randint(1, 6)):  # forms pick arbitrarily)
            seq += 1
            if rnd.random() < 0.25 and not used_null:
                used_null, ts = True, None
            else:
                ts = f"2024-01-{rnd.randint(1, 28):02d} 00:00:{seq % 60:02d}"
            rows.append((key, float(seq), ts))
    rows.append((999, 1.0, None))  # all-null key must still keep a row
    df = spark.createDataFrame(
        rows, "Id int, Value double, UpdatedAt string"
    ).select("Id", "Value", F.col("UpdatedAt").cast("timestamp").alias("UpdatedAt"))
    # unique (nn, ts) per key (seq-seconds) => the tie-free total order
    # both forms agree on
    cfg = IndexConfig(column="Id", type=TEMPORAL, timestamp_column="UpdatedAt")
    got = apply_temporal_dedup(df, [cfg])
    w = Window.partitionBy("Id").orderBy(F.col("UpdatedAt").desc_nulls_last())
    want = (
        df.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )
    assert_same_rows(got, want)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan, plan  # map-side combine, skew-safe


@pytest.mark.slow
def test_temporal_dedup_multi_config_keeps_window_semantics(spark):
    """Two temporal configs filter conjunctively against ranks computed
    on the ORIGINAL rows (reference CHANGELOG 0.1.5/0.1.8) — the max_by
    shortcut must NOT engage (an iterated groupBy would rank the second
    config against already-filtered rows)."""
    from ariadne_spark.operators.join import apply_temporal_dedup
    from ariadne_spark.storage.metadata import TEMPORAL, IndexConfig

    rows = [
        # (A, B, tsA, tsB): row must be latest for BOTH its A and its B
        (1, 10, 100.0, "2024-01-01", "2024-06-01"),
        (1, 20, 200.0, "2024-02-01", "2024-01-01"),  # latest A, stale B
        (2, 10, 300.0, "2024-03-01", "2024-01-01"),  # latest A, stale B
    ]
    df = spark.createDataFrame(
        rows, "A int, B int, Value double, tsA string, tsB string"
    ).select(
        "A", "B", "Value",
        F.col("tsA").cast("timestamp").alias("tsA"),
        F.col("tsB").cast("timestamp").alias("tsB"),
    )
    cfgs = [
        IndexConfig(column="A", type=TEMPORAL, timestamp_column="tsA"),
        IndexConfig(column="B", type=TEMPORAL, timestamp_column="tsB"),
    ]
    got = {(r["A"], r["B"], r["Value"]) for r in apply_temporal_dedup(df, cfgs).collect()}
    # rank-1 by A: r2 (A=1), r3 (A=2); rank-1 by B: r1 (B=10), r2 (B=20)
    # -> only r2 tops BOTH ranks. r1 fails the A rank, r3 fails the B
    # rank (B=10's latest tsB lives on the A-stale r1 — exactly the
    # original-rows semantics an iterated groupBy would get wrong).
    assert got == {(1, 20, 200.0)}, got


@pytest.mark.slow
def test_temporal_dedup_multi_config_is_window_free_and_parity(spark):
    """r10 (verdict #3): the multi-config conjunction now runs as
    per-config partial-agg winner sets intersected by full-row
    semi-joins — NO Window node over the data — and returns exactly
    the window form's rows on tie-free data (randomized, two configs,
    null timestamps and an all-null key included)."""
    import random

    from pyspark.sql import Window

    from ariadne_spark.operators.join import apply_temporal_dedup
    from ariadne_spark.storage.metadata import TEMPORAL, IndexConfig

    rnd = random.Random(11)
    rows = []
    seq = 0
    for _ in range(120):
        seq += 1
        a, b = rnd.randint(0, 15), rnd.randint(0, 9)
        # seq-seconds keep every (key, ts) order total per config
        tsa = (
            None
            if rnd.random() < 0.15
            else f"2024-01-{rnd.randint(1, 28):02d} 00:{seq // 60:02d}:{seq % 60:02d}"
        )
        tsb = f"2024-02-{rnd.randint(1, 28):02d} 00:{seq // 60:02d}:{seq % 60:02d}"
        rows.append((a, b, float(seq), tsa, tsb))
    rows.append((99, 99, -1.0, None, "2024-03-01 00:00:00"))
    df = spark.createDataFrame(
        rows, "A int, B int, Value double, tsA string, tsB string"
    ).select(
        "A", "B", "Value",
        F.col("tsA").cast("timestamp").alias("tsA"),
        F.col("tsB").cast("timestamp").alias("tsB"),
    )
    cfgs = [
        IndexConfig(column="A", type=TEMPORAL, timestamp_column="tsA"),
        IndexConfig(column="B", type=TEMPORAL, timestamp_column="tsB"),
    ]
    got = apply_temporal_dedup(df, cfgs)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan, plan  # map-side combine, skew-safe
    wa = Window.partitionBy("A").orderBy(F.col("tsA").desc_nulls_last())
    wb = Window.partitionBy("B").orderBy(F.col("tsB").desc_nulls_last())
    want = (
        df.withColumn("__ra", F.row_number().over(wa))
        .withColumn("__rb", F.row_number().over(wb))
        .where("__ra = 1 AND __rb = 1")
        .drop("__ra", "__rb")
    )
    assert_same_rows(got, want)


def test_temporal_dedup_map_schema_keeps_window_form(spark):
    """Map-typed columns cannot be semi-join keys: the multi-config
    path must fall back to the window form and still return the
    conjunctive rows."""
    from ariadne_spark.operators.join import apply_temporal_dedup
    from ariadne_spark.storage.metadata import TEMPORAL, IndexConfig

    df = spark.createDataFrame(
        [
            (1, 10, {"k": "v1"}, "2024-01-01", "2024-06-01"),
            (1, 20, {"k": "v2"}, "2024-02-01", "2024-01-01"),
            (2, 10, {"k": "v3"}, "2024-03-01", "2024-01-01"),
        ],
        "A int, B int, M map<string,string>, tsA string, tsB string",
    ).select(
        "A", "B", "M",
        F.col("tsA").cast("timestamp").alias("tsA"),
        F.col("tsB").cast("timestamp").alias("tsB"),
    )
    cfgs = [
        IndexConfig(column="A", type=TEMPORAL, timestamp_column="tsA"),
        IndexConfig(column="B", type=TEMPORAL, timestamp_column="tsB"),
    ]
    got = {
        (r["A"], r["B"], r["M"]["k"])
        for r in apply_temporal_dedup(df, cfgs).collect()
    }
    assert got == {(1, 20, "v2")}, got


@pytest.mark.slow
def test_bloom_dataframe_source_over_probe_cap(spark, storage, orders_files, monkeypatch):
    """A DataFrame query source with more distinct values than
    BLOOM_PROBE_CAP must fall back to a conservative no-prune — with
    the skip surfaced in locate stats — and still join correctly."""
    from ariadne_spark.plans import locate as locate_mod

    df, files = orders_files
    idx = Index.for_name("o_cap", schema=df.schema, format="parquet", spark=spark)
    idx.add_bloom_index("o_orderkey").add_files(files).update()
    monkeypatch.setattr(locate_mod, "BLOOM_PROBE_CAP", 10)
    other = df.select("o_orderkey").distinct().limit(50)
    located = idx.locate_files(other, columns=["o_orderkey"])
    assert set(located) == {normalize_path(f) for f in files}  # no prune
    stats = idx._last_locate_stats.per_column
    assert stats["o_orderkey"]["skipped"] is True
    got = idx.join(df.select("o_orderkey").limit(30), on=["o_orderkey"])
    assert got.count() > 0


@pytest.mark.slow
def test_bloom_cost_floor_skips_probe(spark, storage, orders_files):
    """The minBloomPruneBytes cost floor (default 32 MiB; pinned to 0
    in conftest) must skip probing on a too-small index — visibly, via
    locate stats — while joins stay correct via the conservative full
    candidate set."""
    df, files = orders_files
    idx = Index.for_name(
        "o_blm_floor", schema=df.schema, format="parquet", spark=spark
    )
    idx.add_bloom_index("o_orderkey", fpr=0.01).add_files(files).update()
    spark.conf.set("spark.ariadne.minBloomPruneBytes", str(1 << 40))
    try:
        keys = spark.createDataFrame([(5,), (6,)], ["o_orderkey"])
        located = idx.locate_files(keys, columns=["o_orderkey"])
        assert set(located) == {normalize_path(f) for f in files}  # no prune
        st = idx._last_locate_stats.per_column["o_orderkey"]
        assert st["skipped"] is True
        assert "minBloomPruneBytes" in st["reason"]
        res = idx.join(keys, on=["o_orderkey"])
        assert_same_rows(res, df.join(keys, ["o_orderkey"]))
    finally:
        spark.conf.set("spark.ariadne.minBloomPruneBytes", "0")


@pytest.mark.slow
def test_footer_stats_build_matches_scan_build(spark, storage, orders_files):
    """RANGE index rows built from parquet footer statistics equal the
    scan build exactly for numeric columns, and queries answer
    identically — the no-data-pass path for indexing an existing lake."""
    df, files = orders_files
    scan = Index.for_name("r_scan", schema=df.schema, format="parquet", spark=spark)
    scan.add_range_index("o_orderkey").add_files(files).update()
    foot = Index.for_name("r_foot", schema=df.schema, format="parquet", spark=spark)
    foot.add_range_index("o_orderkey").add_files(files).update(footer_stats=True)

    srows = {
        r["filename"]: (r["range_o_orderkey"]["min"], r["range_o_orderkey"]["max"])
        for r in scan.index_df.collect()
    }
    frows = {
        r["filename"]: (r["range_o_orderkey"]["min"], r["range_o_orderkey"]["max"])
        for r in foot.index_df.collect()
    }
    assert srows == frows and len(frows) == len(files)

    keys = [5, 17, 101]
    a = scan.read_matching({"o_orderkey": keys})
    b = foot.read_matching({"o_orderkey": keys})
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert sorted(scan.locate_files({"o_orderkey": keys})) == sorted(
        foot.locate_files({"o_orderkey": keys})
    )


def test_footer_stats_ineligible_falls_back(spark, storage, orders_files):
    """A non-RANGE config silently uses the scan build (flag is a hint,
    not a correctness switch)."""
    df, files = orders_files
    idx = Index.for_name("r_mix", schema=df.schema, format="parquet", spark=spark)
    idx.add_range_index("o_orderkey").add_index("o_custkey")
    idx.add_files(files).update(footer_stats=True)
    res = idx.read_matching({"o_custkey": [5]})
    assert res.count() == df.where(F.col("o_custkey") == 5).count()


@pytest.mark.slow
def test_footer_stats_missing_statistics_falls_back(spark, storage, tmp_path):
    """Files written WITHOUT parquet statistics must not produce null
    ranges (which locate would read as prune-everything): the footer
    build detects the gap and the update falls back to the scan build."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = []
    for i in range(2):
        t = pa.table({"k": pa.array(range(i * 100, i * 100 + 100), pa.int64())})
        p = str(tmp_path / f"nostats{i}.parquet")
        pq.write_table(t, p, write_statistics=False)
        files.append(p)
    df = spark.read.parquet(*files)
    idx = Index.for_name("r_nostat", schema=df.schema, format="parquet", spark=spark)
    idx.add_range_index("k").add_files(files).update(footer_stats=True)
    # scan fallback produced real bounds: the value IS found
    assert idx.read_matching({"k": [150]}).count() == 1
    assert len(idx.locate_files({"k": [150]})) == 1


@pytest.mark.slow
def test_multiple_bloom_columns_and_intersection(spark, storage, orders_files):
    """Two bloom columns on one index AND-intersect their candidate
    sets (reference: BloomFilterOperationsTests.scala:170-217,
    MultiColumnIntersectTests.scala:134-155)."""
    df, files = orders_files
    idx = Index.for_name("bb2", schema=df.schema, format="parquet", spark=spark)
    idx.add_bloom_index("o_orderkey").add_bloom_index("o_custkey")
    idx.add_files(files).update()
    row = df.limit(1).collect()[0]
    res = idx.read_matching(
        {"o_orderkey": [row["o_orderkey"]], "o_custkey": [row["o_custkey"]]}
    )
    got = res.select("o_orderkey", "o_custkey").collect()
    assert all(
        r["o_orderkey"] == row["o_orderkey"]
        and r["o_custkey"] == row["o_custkey"]
        for r in got
    ) and got
    # definitely-absent values across both columns → empty, schema kept
    none = idx.read_matching(
        {"o_orderkey": [999999991], "o_custkey": [999999992]}
    )
    assert none.count() == 0 and none.columns == res.columns
    # AND with one absent side prunes everything (files intersect empty)
    assert idx.locate_files(
        {"o_orderkey": [row["o_orderkey"]], "o_custkey": [999999992]}
    ) == []


@pytest.mark.slow
def test_band_query_prunes_and_matches(spark, storage, orders_files):
    """Band(lo, hi) on a range index prunes at file grain and the row
    filter restores exactness — the SQL >=/< shape without value
    enumeration."""
    from ariadne_spark import Band

    df, files = orders_files
    idx = Index.for_name("r_band", schema=df.schema, format="parquet", spark=spark)
    idx.add_range_index("o_orderkey").add_files(files).update()
    lo, hi = df.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    width = (hi - lo) // 4 + 1
    band = Band(lo=lo + 1, hi=lo + width // 2, hi_inc=False)
    res = idx.read_matching({"o_orderkey": band})
    want = df.where(
        (F.col("o_orderkey") >= band.lo) & (F.col("o_orderkey") < band.hi)
    )
    assert res.count() == want.count() > 0
    located = idx.locate_files({"o_orderkey": band})
    assert 0 < len(located) < len(files)
    # band on a non-range index raises
    from ariadne_spark.exceptions import ColumnNotIndexedError

    reg = Index.for_name("r_band2", schema=df.schema, format="parquet", spark=spark)
    reg.add_index("o_custkey").add_files(files).update()
    with pytest.raises(ColumnNotIndexedError):
        reg.locate_files({"o_custkey": Band(lo=1)})


@pytest.mark.slow
def test_keyword_search_ranks_and_prunes(spark, storage, tmp_path):
    """keyword_search over an exploded-token index: deterministic
    integer ranking (distinct terms, then tf, then id), file pruning
    when a term is confined to one file, TakeOrderedAndProject tail."""
    from ariadne_spark.operators.search import keyword_search

    rows = [
        # file A (doc_id < 10): 'alpha' lives only here
        (1, "alpha beta alpha gamma"),      # 2 terms: alpha(2) beta(1)
        (2, "alpha alpha alpha alpha"),     # 1 term: alpha(4)
        (3, "delta delta delta"),           # no query terms
        # file B: beta-only docs, so 'alpha' stays confined to file A
        (11, "beta beta beta beta beta"),   # 1 term: beta(5)
        (12, "beta gamma"),                 # 1 term: beta(1)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df = df.select("doc_id", F.split("text", " ").alias("tokens"))
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    df.where("doc_id < 10").coalesce(1).write.parquet(a)
    df.where("doc_id >= 10").coalesce(1).write.parquet(b)
    import glob as _glob

    files = sorted(
        _glob.glob(f"{a}/*.parquet") + _glob.glob(f"{b}/*.parquet")
    )
    idx = Index.for_name("kw", schema=df.schema, format="parquet", spark=spark)
    idx.add_exploded_index("tokens", as_column="token")
    idx.add_files(files).update()

    got = keyword_search(idx, ["alpha", "beta"], k=3).collect()
    # doc 1 matches 2 distinct terms -> first despite fewer hits
    assert [(r["doc_id"], r["n_terms"], r["total_hits"]) for r in got] == [
        (1, 2, 3), (11, 1, 5), (2, 1, 4)
    ]
    # the single-term query prunes to file A only
    located = idx.locate_files({"token": ["alpha"]})
    assert len(located) == 1
    # selection tail is a TakeOrdered, not a global sort
    plan = (
        keyword_search(idx, ["alpha"], k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError):
        keyword_search(idx, [], k=2)
