"""Hashed-feature text classification: separability, determinism,
tie-breaks, and numpy parity for the log-NB variant."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ariadne_spark.operators.classifier import (
    mass_classify,
    mass_train,
    nb_log_scores,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def toy(spark):
    rows = []
    # two disjoint-vocabulary classes: perfectly separable
    for i in range(30):
        rows.append((i, "apple banana cherry date elderberry fig", "fruit"))
    for i in range(30, 60):
        rows.append((i, "carrot potato onion leek turnip beet", "veg"))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_mass_classify_separable(spark, toy):
    model = mass_train(toy, label_col="label")
    test = spark.createDataFrame(
        [(100, "banana fig cherry"), (101, "leek beet onion carrot")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_label"]
           for r in mass_classify(test, model, label_col="label").collect()}
    assert got == {100: "fruit", 101: "veg"}


def test_mass_classify_tie_breaks_to_smaller_label(spark):
    # symmetric classes: a doc with zero evidence for both ties at the
    # prior; equal totals -> equal ratio -> smaller label wins
    train = spark.createDataFrame(
        [(1, "aaa bbb", "x"), (2, "ccc ddd", "y")],
        ["doc_id", "text", "label"],
    )
    model = mass_train(train, label_col="label")
    test = spark.createDataFrame([(9, "zzz qqq")], ["doc_id", "text"])
    out = mass_classify(test, model, label_col="label").collect()[0]
    assert out["pred_label"] == "x"


def test_mass_classify_partition_independent(spark, toy):
    model = mass_train(toy, label_col="label")
    test = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(
        (r["doc_id"], r["pred_label"], r["ratio"])
        for r in mass_classify(test, model, label_col="label").collect()
    )
    b = sorted(
        (r["doc_id"], r["pred_label"], r["ratio"])
        for r in mass_classify(
            test.repartition(7), model, label_col="label"
        ).collect()
    )
    assert a == b


def test_nb_log_scores_matches_numpy(spark):
    from ariadne_spark.operators.corpus import gram_bucket  # noqa: F401

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    train = docs.where(F.col("doc_id") % 3 != 0).select(
        "doc_id", "text", F.col("lang").alias("label")
    )
    test = docs.where(F.col("doc_id") % 3 == 0).limit(20).select(
        "doc_id", "text"
    )
    n_buckets = 4096
    model = mass_train(train, label_col="label", n_buckets=n_buckets)
    got = {
        (r["doc_id"], r["label"]): r["log_score"]
        for r in nb_log_scores(
            test, model, label_col="label", n_buckets=n_buckets
        ).collect()
    }

    # numpy reference over the same hashed counts
    counts = {(r["label"], r["bucket"]): r["cnt"] for r in model.collect()}
    labels = sorted({l for l, _ in counts})
    dens = {
        l: sum(c for (ll, _), c in counts.items() if ll == l) + n_buckets
        for l in labels
    }
    import hashlib

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % n_buckets

    for row in test.collect():
        toks = row["text"].strip().split()
        for l in labels:
            want = sum(
                math.log(counts.get((l, bucket(t)), 0) + 1)
                - math.log(dens[l])
                for t in toks
            )
            assert got[(row["doc_id"], l)] == pytest.approx(want, rel=1e-9)


def test_nb_log_agrees_with_mass_on_separable(spark, toy):
    model = mass_train(toy, label_col="label")
    test = spark.createDataFrame(
        [(100, "banana fig"), (101, "leek beet")], ["doc_id", "text"]
    )
    logs = nb_log_scores(test, model, label_col="label").collect()
    best = {}
    for r in logs:
        cur = best.get(r["doc_id"])
        if cur is None or r["log_score"] > cur[1]:
            best[r["doc_id"]] = (r["label"], r["log_score"])
    massed = {r["doc_id"]: r["pred_label"]
              for r in mass_classify(test, model, label_col="label").collect()}
    assert {k: v[0] for k, v in best.items()} == massed


# --- threshold_sweep (PR-curve calibration) -------------------------------


def test_threshold_sweep_hand_computed(spark):
    from ariadne_spark.operators.classifier import threshold_sweep

    rows = [
        (0.9, True), (0.8, True), (0.7, False), (0.6, True),
        (0.4, False), (0.2, False), (None, True), (0.5, None),
    ]
    df = spark.createDataFrame(rows, "score double, y boolean")
    got = {
        r["threshold"]: r
        for r in threshold_sweep(df, "score", "y", [0.5, 0.75, 1.1]).collect()
    }
    assert len(got) == 3
    # valid population: 6 rows (null score / null label excluded), pos=3 neg=3
    r = got[0.5]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (3, 1, 0, 2)
    assert r["precision"] == 3 / 4 and r["recall"] == 1.0
    assert r["f1"] == 6 / 7
    r = got[0.75]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 0, 1, 3)
    assert r["precision"] == 1.0 and r["recall"] == 2 / 3
    # nothing passes at 1.1: precision NULL (0/0), recall 0
    r = got[1.1]
    assert (r["tp"], r["fp"]) == (0, 0)
    assert r["precision"] is None and r["recall"] == 0.0 and r["f1"] == 0.0


def test_threshold_sweep_single_scan_no_shuffle_blowup(spark):
    from ariadne_spark.operators.classifier import threshold_sweep

    df = spark.range(1000).select(
        (F.col("id") / 1000).alias("score"), (F.col("id") % 2 == 0).alias("y")
    )
    out = threshold_sweep(df, "score", "y", [i / 20 for i in range(20)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no Generate/explode of the data side, single aggregate tree
    assert "Generate explode" not in plan
    assert out.count() == 20
    with pytest.raises(ValueError):
        threshold_sweep(df, "score", "y", [])


def test_threshold_sweep_matches_python_reference_on_random_data(spark):
    """Seeded randomized parity vs a pure-Python confusion count, plus
    the structural invariants: tp monotone nonincreasing in the
    threshold and tp+fn constant (= labeled positives)."""
    import random

    from ariadne_spark.operators.classifier import threshold_sweep

    rng = random.Random(20260816)
    rows = []
    for i in range(400):
        s = None if rng.random() < 0.05 else round(rng.random(), 3)
        y = None if rng.random() < 0.05 else rng.random() < 0.4
        rows.append((s, y))
    ths = sorted({round(rng.random(), 2) for _ in range(12)})
    df = spark.createDataFrame(rows, "score double, y boolean")
    got = {
        r["threshold"]: r for r in threshold_sweep(df, "score", "y", ths).collect()
    }
    valid = [(s, y) for s, y in rows if s is not None and y is not None]
    pos = sum(1 for _, y in valid if y)
    prev_tp = None
    for t in ths:
        tp = sum(1 for s, y in valid if s >= t and y)
        fp = sum(1 for s, y in valid if s >= t and not y)
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (
            tp, fp, pos - tp, len(valid) - pos - fp
        )
        if prev_tp is not None:
            assert r["tp"] <= prev_tp  # monotone in the threshold
        prev_tp = r["tp"]
        assert r["tp"] + r["fn"] == pos


def test_threshold_sweep_empty_slice_and_nonfinite_guard(spark):
    """An empty (or filtered-to-empty) slice yields ZERO confusion
    counts, not NULLs; non-finite thresholds fail fast instead of
    rendering broken SQL."""
    import math

    from ariadne_spark.operators.classifier import threshold_sweep

    df = spark.createDataFrame([], "score double, y boolean")
    rows = threshold_sweep(df, "score", "y", [0.2, 0.8]).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 0, 0)
        assert r["precision"] is None and r["recall"] is None
    with pytest.raises(ValueError):
        threshold_sweep(df, "score", "y", [float("nan")])
    with pytest.raises(ValueError):
        threshold_sweep(df, "score", "y", [math.inf])
