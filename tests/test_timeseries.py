"""Time-series operators: sessionize / rollup / as-of join.

Edge-case fixtures exercise the semantics the sf-scale oracle queries
can't isolate: gap boundaries, exact-timestamp ties, tiebreak order,
tolerance nulling, and unmatched left rows.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ariadne_spark.operators.timeseries import (
    asof_join,
    rollup,
    session_stats,
    sessionize,
    time_bucket,
)


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, eid bigint, value double"
    )


class TestSessionize:
    def test_gap_boundary_is_exclusive(self, spark):
        # gap == threshold stays in-session; gap > threshold splits.
        df = _events(
            spark,
            [
                ("a", _ts(0), 1, 1.0),
                ("a", _ts(10), 2, 1.0),   # exactly 600s later: same session
                ("a", _ts(20, 1), 3, 1.0),  # 601s later: new session
            ],
        )
        out = {
            r["eid"]: r["session_seq"]
            for r in sessionize(df, "key", "ts", 600, "eid").collect()
        }
        assert out == {1: 1, 2: 1, 3: 2}

    def test_sessions_are_per_key(self, spark):
        df = _events(
            spark,
            [
                ("a", _ts(0), 1, 1.0),
                ("b", _ts(0), 2, 1.0),
                ("b", _ts(59), 3, 1.0),
            ],
        )
        out = sessionize(df, "key", "ts", 60, "eid")
        assert {(r["key"], r["session_seq"]) for r in out.collect()} == {
            ("a", 1),
            ("b", 1),
            ("b", 2),
        }

    def test_session_stats(self, spark):
        df = _events(
            spark,
            [
                ("a", _ts(0), 1, 1.5),
                ("a", _ts(1), 2, 2.5),
                ("a", _ts(30), 3, 4.0),
            ],
        )
        rows = {
            r["session_seq"]: r
            for r in session_stats(
                df, "key", "ts", 600, "eid", value_col="value"
            ).collect()
        }
        assert rows[1]["n_events"] == 2 and rows[1]["sum_value"] == 4.0
        assert rows[2]["n_events"] == 1 and rows[2]["session_start"] == _ts(30)


class TestRollup:
    def test_bucket_alignment_epoch(self, spark):
        df = _events(
            spark,
            [("a", _ts(0), 1, 1.0), ("a", _ts(4, 59), 2, 1.0), ("a", _ts(5), 3, 1.0)],
        )
        out = rollup(df, "ts", 300)
        counts = {r["bucket_start"]: r["n_events"] for r in out.collect()}
        assert counts == {_ts(0): 2, _ts(5): 1}

    def test_time_bucket_is_window_start(self, spark):
        df = _events(spark, [("a", _ts(7, 30), 1, 1.0)])
        got = df.select(time_bucket("ts", 300).alias("b")).first()["b"]
        assert got == _ts(5)

    def test_rollup_custom_aggs_and_dims(self, spark):
        df = _events(
            spark,
            [("a", _ts(0), 1, 2.0), ("b", _ts(1), 2, 3.0), ("a", _ts(2), 3, 5.0)],
        )
        out = rollup(
            df, "ts", 3600, ["key"], [F.sum("value").alias("sv")]
        ).collect()
        assert {(r["key"], r["sv"]) for r in out} == {("a", 7.0), ("b", 3.0)}


class TestAsofJoin:
    def _sides(self, spark):
        left = spark.createDataFrame(
            [
                ("a", _ts(10), 100),
                ("a", _ts(20), 101),
                ("b", _ts(10), 102),   # no right rows for b at all
                ("a", _ts(5), 103),    # before every right row
            ],
            "key string, ts timestamp, lid bigint",
        )
        right = spark.createDataFrame(
            [
                ("a", _ts(10), 1, 10.0),  # exact-ts match for lid=100
                ("a", _ts(10), 2, 20.0),  # same ts: larger tiebreak wins
                ("a", _ts(15), 3, 30.0),
            ],
            "key string, ts timestamp, rid bigint, rv double",
        )
        return left, right

    def test_backward_inclusive_with_tiebreak(self, spark):
        left, right = self._sides(spark)
        out = {
            r["lid"]: (r["ts_asof"], r["rv_asof"])
            for r in asof_join(
                left, right, ["key"], "ts", ["rv"], tiebreak_col="rid"
            ).collect()
        }
        assert out[100] == (_ts(10), 20.0)  # inclusive; rid=2 beats rid=1
        assert out[101] == (_ts(15), 30.0)
        assert out[102] == (None, None)     # key never matches
        assert out[103] == (None, None)     # left row precedes all right rows

    def test_tolerance_nulls_stale_matches(self, spark):
        left, right = self._sides(spark)
        out = {
            r["lid"]: r["rv_asof"]
            for r in asof_join(
                left,
                right,
                ["key"],
                "ts",
                ["rv"],
                tiebreak_col="rid",
                tolerance_seconds=60,
            ).collect()
        }
        assert out[100] == 20.0   # 0s old: kept
        assert out[101] is None   # 300s old: outside tolerance
        assert out[102] is None

    def test_row_count_preserved(self, spark):
        left, right = self._sides(spark)
        res = asof_join(left, right, ["key"], "ts", ["rv"], tiebreak_col="rid")
        assert res.count() == left.count()
        assert set(res.columns) == {"key", "ts", "lid", "ts_asof", "rv_asof"}

    def test_missing_column_raises(self, spark):
        left, right = self._sides(spark)
        try:
            asof_join(left, right.drop("ts"), ["key"], "ts", ["rv"])
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "missing" in str(e)

    def test_single_shuffle_plan(self, spark):
        """The as-of plan must contain exactly ONE exchange (the key
        hash) — no range join, no extra sort shuffles."""
        left, right = self._sides(spark)
        res = asof_join(left, right, ["key"], "ts", ["rv"], tiebreak_col="rid")
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestResample:
    def _sparse(self, spark):
        # key a: buckets 0,2 occupied (bucket 1 missing); key b: dense
        return _events(
            spark,
            [
                ("a", _ts(0), 1, 10.0),
                ("a", _ts(21), 2, 30.0),   # bucket 2 (600s buckets)
                ("b", _ts(0), 3, 1.0),
                ("b", _ts(10), 4, 2.0),
                ("b", _ts(20), 5, 3.0),
            ],
        )

    def _run(self, spark, fill):
        from ariadne_spark.operators.timeseries import resample

        out = resample(
            self._sparse(spark),
            "ts",
            600,
            ["key"],
            [
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("sv"),
            ],
            fill=fill,
        )
        return {
            (r["key"], r["bucket_start"].minute): (r["n"], r["sv"])
            for r in out.collect()
        }

    def test_null_fill_inserts_empty_buckets(self, spark):
        got = self._run(spark, "null")
        assert got[("a", 10)] == (None, None)
        assert got[("a", 0)] == (1, 10.0)
        assert got[("a", 20)] == (1, 30.0)
        assert len(got) == 6  # 3 buckets per key, dense grid

    def test_zero_fill(self, spark):
        got = self._run(spark, "zero")
        assert got[("a", 10)] == (0, 0.0)

    def test_prev_fill_carries_last_value_forward(self, spark):
        got = self._run(spark, "prev")
        assert got[("a", 10)] == (1, 10.0)  # carried from bucket 0
        assert got[("a", 20)] == (1, 30.0)  # real bucket unchanged

    def test_dense_input_equals_rollup(self, spark):
        from ariadne_spark.operators.timeseries import resample

        df = self._sparse(spark).where("key = 'b'")
        args = ("ts", 600, ["key"], [F.count(F.lit(1)).alias("n")])
        r1 = {tuple(r) for r in resample(df, *args, fill="zero").collect()}
        r2 = {tuple(r) for r in rollup(df, "ts", 600, ["key"],
                                       [F.count(F.lit(1)).alias("n")]).select(
            "key", "bucket_start", "n").collect()}
        assert r1 == r2

    def test_bad_fill_raises(self, spark):
        from ariadne_spark.operators.timeseries import resample
        import pytest

        with pytest.raises(ValueError, match="fill"):
            resample(self._sparse(spark), "ts", 600, ["key"], fill="interp")


class TestResampleInvariants:
    """Randomized (fixed-seed) invariants over a bigger sparse series:
    grid density, conservation vs rollup, forward-fill totality."""

    def _random_events(self, spark):
        import random

        rng = random.Random(7)
        rows = []
        for eid in range(300):
            key = rng.choice(["a", "b", "c"])
            # sparse: events land in ~15% of 10-minute buckets over a week
            minute = rng.randrange(0, 7 * 24 * 60, 10) + rng.randrange(10)
            ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                minutes=minute
            )
            rows.append((key, ts, eid, float(rng.randrange(100))))
        return spark.createDataFrame(
            rows, "key string, ts timestamp, eid bigint, value double"
        )

    def test_grid_density_conservation_and_fill_totality(self, spark):
        from ariadne_spark.operators.timeseries import resample, rollup

        df = self._random_events(spark)
        width = 600
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
        ]
        out = resample(df, "ts", width, ["key"], aggs, fill="zero").collect()

        # (1) dense grid: per key, buckets advance by exactly `width`
        by_key: dict = {}
        for r in out:
            by_key.setdefault(r["key"], []).append(r["bucket_start"])
        for key, buckets in by_key.items():
            buckets.sort()
            steps = {
                (b2 - b1).total_seconds()
                for b1, b2 in zip(buckets, buckets[1:])
            }
            assert steps == {float(width)}, f"gaps remain for key {key}"

        # (2) conservation: zero-filling adds no mass
        rolled = rollup(df, "ts", width, ["key"], aggs).collect()
        assert sum(r["n"] for r in out) == sum(r["n"] for r in rolled) == 300
        assert abs(
            sum(r["sv"] for r in out) - sum(r["sv"] for r in rolled)
        ) < 1e-9

        # (3) prev-fill totality: nulls never appear (each key's grid
        # starts at its first OCCUPIED bucket, so there is always a
        # previous value to carry)
        prev = resample(df, "ts", width, ["key"], aggs, fill="prev").collect()
        assert len(prev) == len(out)
        assert all(r["n"] is not None and r["sv"] is not None for r in prev)
