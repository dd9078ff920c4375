"""Blocked fuzzy join (record linkage), Misra-Gries heavy hitters,
and the bucketized point-in-interval join — r10 additions, each
checked against a brute-force computation of the same contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_spark.operators.linkage import fuzzy_join
from ariadne_spark.operators.profile import heavy_hitters
from ariadne_spark.operators.timeseries import interval_join


# ------------------------------------------------------------ fuzzy join

def _names(spark):
    left = spark.createDataFrame(
        [
            (1, "Acme Corp"),
            (2, "Globex"),
            (3, "Initech"),
            (4, "Umbrella"),
        ],
        ["lid", "name"],
    )
    right = spark.createDataFrame(
        [
            (10, "Acme Co"),      # dist 2 to "Acme Corp": match
            (11, "Acme Corp"),    # exact
            (12, "globex"),       # case typo: dist 1? 'G'->'g' = 1
            (13, "Xnitech"),      # typo IN the prefix: blocked away
            (14, "Umbrellas"),    # dist 1
            (15, "Wayne Ent"),    # unrelated
        ],
        ["rid", "name"],
    )
    return left, right


def test_fuzzy_join_inner_matches_blocked_contract(spark):
    left, right = _names(spark)
    got = {
        (r["lid"], r["rid"])
        for r in fuzzy_join(
            left, right, "name", "name", max_distance=2, block_prefix=3
        ).collect()
    }
    # brute force of the SAME contract: shared lower-3-prefix block AND
    # levenshtein <= 2 (case-sensitive on the raw strings)
    import itertools

    lrows = left.collect()
    rrows = right.collect()

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (l["lid"], r["rid"])
        for l, r in itertools.product(lrows, rrows)
        if l["name"].lower()[:3] == r["name"].lower()[:3]
        and lev(l["name"], r["name"]) <= 2
    }
    assert got == want
    # the prefix-typo row is a defined NON-match (blocking contract)
    assert all(rid != 13 for _, rid in got)
    # case typo within distance matches across blocks? no — blocks are
    # lowercased so 'globex' and 'Globex' share a block and match
    assert (2, 12) in got


def test_fuzzy_join_left_keeps_unmatched(spark):
    left, right = _names(spark)
    out = fuzzy_join(
        left, right, "name", "name", max_distance=1, block_prefix=3,
        how="left",
    )
    rows = out.collect()
    # every left row appears at least once
    assert {r["lid"] for r in rows} == {1, 2, 3, 4}
    unmatched = {r["lid"] for r in rows if r["rid"] is None}
    # Initech has no within-1 partner ("Xnitech" is blocked away)
    assert 3 in unmatched


def test_fuzzy_join_bounded_levenshtein_matches_unbounded(spark):
    """r11: the verify predicate uses the THRESHOLD form of
    levenshtein (banded DP, early exit) — the pair set must equal the
    unbounded `levenshtein(l, r) <= d` form on every edge class:
    exact match, at-threshold, one-past-threshold, big length deltas,
    empty strings, and unicode."""
    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(
            ["abc", "abcd", "abcdefgh", "", "café", "abXY"]
        )],
        ["lid", "lname"],
    )
    right = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(
            ["abc", "abZ", "abZZ", "abZZZ", "abcdefghijkl", "cafés",
             "ab", "a"]
        )],
        ["rid", "rname"],
    )
    for d in (0, 1, 2, 3):
        got = {
            (r["lid"], r["rid"])
            for r in fuzzy_join(
                left, right, "lname", "rname",
                max_distance=d, block_prefix=1,
            ).collect()
        }
        want = {
            (r["lid"], r["rid"])
            for r in left.withColumn("b", F.substring(F.lower(F.trim("lname")), 1, 1))
            .join(
                right.withColumn("b", F.substring(F.lower(F.trim("rname")), 1, 1)),
                "b",
            )
            .where(F.levenshtein("lname", "rname") <= F.lit(d))
            .collect()
        }
        assert got == want, f"max_distance={d}"


def test_fuzzy_join_validates_inputs(spark):
    left, right = _names(spark)
    with pytest.raises(ValueError, match="how"):
        fuzzy_join(left, right, "name", "name", how="outer")
    with pytest.raises(ValueError, match="missing"):
        fuzzy_join(left, right, "nope", "name")


# --------------------------------------------------------- heavy hitters

def test_heavy_hitters_exact_over_many_partitions(spark):
    rows = (
        [("a",)] * 60 + [("b",)] * 40 + [("c",)] * 30
        + [(f"s{i}",) for i in range(20)]
    )
    df = spark.createDataFrame(rows, ["v"]).repartition(13)
    n = 150
    for k in (2, 4, 8):
        got = {
            (r["v"], r["count"])
            for r in heavy_hitters(df, "v", k, capacity=k).collect()
        }
        want = {
            c for c in (("a", 60), ("b", 40), ("c", 30))
            if c[1] > n / k
        }
        want |= {(f"s{i}", 1) for i in range(20) if 1 > n / k}
        assert got == want, (k, got)


def test_heavy_hitters_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [("x",), (None,), ("x",), (None,), ("y",)], ["v"]
    )
    got = {(r["v"], r["count"]) for r in heavy_hitters(df, "v", 2).collect()}
    # n counts non-null rows only: n=3, threshold 1.5 -> x (2)
    assert got == {("x", 2)}
    empty = spark.createDataFrame([], "v string")
    assert heavy_hitters(empty, "v", 3).count() == 0


def test_heavy_hitters_validates(spark):
    df = spark.createDataFrame([("x",)], ["v"])
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "v", 1)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "v", 8, capacity=4)


# --------------------------------------------------------- interval join

def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in zip(df.columns, df.schema.fields):
        if t.dataType.simpleString() == "string" and c.startswith("t"):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def test_interval_join_matches_naive_theta_join(spark):
    import random

    rnd = random.Random(3)
    points = spark.createDataFrame(
        [
            (i, rnd.choice("uvw"), f"2024-01-01 00:{rnd.randint(0,59):02d}:00")
            for i in range(80)
        ],
        ["pid", "key", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [
            (
                j,
                rnd.choice("uvw"),
                f"2024-01-01 00:{rnd.randint(0,50):02d}:00",
                rnd.randint(1, 12),
            )
            for j in range(25)
        ],
        ["iid", "key", "ts_start", "mins"],
    ).select(
        "iid",
        "key",
        F.col("ts_start").cast("timestamp").alias("ts_start"),
        (
            F.col("ts_start").cast("timestamp")
            + F.make_interval(mins=F.col("mins"))
        ).alias("ts_end"),
    )
    got = {
        (r["pid"], r["iid_iv"])
        for r in interval_join(
            points, intervals, "ts", "ts_start", "ts_end", on=["key"],
            bucket_seconds=180,
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.key") == F.col("i.key"))
            & (F.col("p.ts") >= F.col("i.ts_start"))
            & (F.col("p.ts") < F.col("i.ts_end")),
        )
        .collect()
    }
    assert got == naive and len(got) > 0
    # default bucket width (avg interval length) gives the same answer
    got_auto = {
        (r["pid"], r["iid_iv"])
        for r in interval_join(
            points, intervals, "ts", "ts_start", "ts_end", on=["key"]
        ).collect()
    }
    assert got_auto == naive


def test_interval_join_bounds_and_overlaps(spark):
    points = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00"), (2, "2024-01-01 00:20:00")],
        ["pid", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00"),  # end==p1
            (2, "2024-01-01 00:05:00", "2024-01-01 00:25:00"),  # both
            (3, "2024-01-01 00:20:00", "2024-01-01 00:21:00"),  # start==p2
        ],
        ["iid", "ts_start", "ts_end"],
    ).select(
        "iid",
        F.col("ts_start").cast("timestamp").alias("ts_start"),
        F.col("ts_end").cast("timestamp").alias("ts_end"),
    )
    excl = {
        (r["pid"], r["iid_iv"])
        for r in interval_join(
            points, intervals, "ts", "ts_start", "ts_end", bucket_seconds=60
        ).collect()
    }
    # end-exclusive: p1 not in iv1; start-inclusive: p2 in iv3;
    # overlapping intervals multiply: p2 in iv2 AND iv3
    assert excl == {(1, 2), (2, 2), (2, 3)}
    incl = {
        (r["pid"], r["iid_iv"])
        for r in interval_join(
            points, intervals, "ts", "ts_start", "ts_end",
            bucket_seconds=60, end_inclusive=True,
        ).collect()
    }
    assert incl == excl | {(1, 1)}


def test_interval_join_is_equi_not_nested_loop(spark):
    """The plan must contain a hash/sort-merge equi join on the grid
    cell, never a BroadcastNestedLoopJoin/CartesianProduct."""
    points = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], ["pid", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 00:30:00")],
        ["iid", "ts_start", "ts_end"],
    ).select(
        "iid",
        F.col("ts_start").cast("timestamp").alias("ts_start"),
        F.col("ts_end").cast("timestamp").alias("ts_end"),
    )
    out = interval_join(
        points, intervals, "ts", "ts_start", "ts_end", bucket_seconds=300
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


# ------------------------------------------------ incremental linkage

@pytest.mark.slow
def test_incremental_fuzzy_link_prunes_without_changing_results(
    spark, tmp_path
):
    """Engine x pipeline #4: a bloom file-index over the reference
    store's BLOCKING keys. A batch reads only reference files holding
    a colliding block — identical matches, fewer files; a
    novel-prefix batch reads zero files; an append the index never
    saw is still matched (lagging index widens, never loses)."""
    from ariadne_spark.operators.linkage import (
        incremental_fuzzy_link,
        reference_store_index,
    )

    spark.conf.set(
        "spark.ariadne.storagePath", str(tmp_path / "ariadne_store")
    )
    store = str(tmp_path / "refstore")
    regions = {
        "alpha": ["alpha widget one", "alpha widget two", "alpha gadget"],
        "beta": ["beta widget one", "beta tool nine"],
        "gamma": ["gamma fixture", "gamma gizmo"],
    }
    rid = 0
    for names in regions.values():
        rows = [(rid + i, n) for i, n in enumerate(names)]
        rid += 100
        spark.createDataFrame(rows, ["rid", "rname"]).coalesce(1).write.mode(
            "append"
        ).parquet(store)
    idx = reference_store_index(spark, store, "ref_idx_test", "rname")

    batch = spark.createDataFrame(
        [(1, "alpha widget onn"), (2, "alpha gadget!")], ["bid", "bname"]
    )
    plain = {
        (r["bid"], r["rid"])
        for r in incremental_fuzzy_link(
            batch, store, "bname", "rname"
        ).collect()
    }
    indexed = {
        (r["bid"], r["rid"])
        for r in incremental_fuzzy_link(
            batch, store, "bname", "rname", store_index=idx
        ).collect()
    }
    assert indexed == plain and len(plain) > 0

    # the prune itself: an alpha-only batch excludes beta/gamma files
    from ariadne_spark.operators.dedup import (
        _prune_snapshot_with_index,
        _snapshot_files,
    )
    from ariadne_spark.operators.linkage import blocking_key
    from pyspark.sql import functions as F

    files = _snapshot_files(spark, store, "reference")
    probe = batch.select(
        blocking_key("bname", 3).alias("block_key")
    ).distinct()
    pruned = _prune_snapshot_with_index(
        spark, files, idx, probe, column="block_key"
    )
    assert 0 < len(pruned) < len(files)

    # novel prefix: zero files read, zero matches
    novel = spark.createDataFrame([(9, "omega thing")], ["bid", "bname"])
    nprobe = novel.select(
        blocking_key("bname", 3).alias("block_key")
    ).distinct()
    assert (
        _prune_snapshot_with_index(
            spark, files, idx, nprobe, column="block_key"
        )
        == []
    )
    out = incremental_fuzzy_link(
        novel, store, "bname", "rname", store_index=idx
    )
    assert out.count() == 0
    assert "rid_r" in out.columns or "rid" in out.columns  # joined shape

    # lagging index: an append the index never saw is still matched
    spark.createDataFrame(
        [(900, "delta machine")], ["rid", "rname"]
    ).coalesce(1).write.mode("append").parquet(store)
    late = spark.createDataFrame([(5, "delta machina")], ["bid", "bname"])
    got = {
        (r["bid"], r["rid"])
        for r in incremental_fuzzy_link(
            late, store, "bname", "rname", store_index=idx
        ).collect()
    }
    assert got == {(5, 900)}


def test_incremental_fuzzy_link_validations(spark, tmp_path):
    from ariadne_spark.operators.linkage import (
        incremental_fuzzy_link,
        reference_store_index,
    )

    spark.conf.set(
        "spark.ariadne.storagePath", str(tmp_path / "ariadne_store")
    )
    store = str(tmp_path / "refstore")
    spark.createDataFrame(
        [(1, "alpha widget")], ["rid", "rname"]
    ).write.parquet(store)
    idx = reference_store_index(spark, store, "ref_idx_val", "rname")
    batch = spark.createDataFrame([(1, "alpha widgets")], ["bid", "bname"])
    # mismatched blocking function is rejected loudly
    with pytest.raises(ValueError, match="block"):
        incremental_fuzzy_link(
            batch, store, "bname", "rname", block_prefix=5, store_index=idx
        )
    # a missing reference store is a configuration error, not "no match"
    with pytest.raises(FileNotFoundError, match="reference store"):
        incremental_fuzzy_link(
            batch, str(tmp_path / "nope"), "bname", "rname"
        )
