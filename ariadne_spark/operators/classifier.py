"""Deterministic hashed-feature text classification.

The fastText-shaped pipeline step — "train a cheap linear-ish text
classifier on a labeled seed set, score the whole corpus" — built so
the decision rule is EXACT across engines:

* :func:`mass_train` — hashed n-gram counts per class. Pure integer
  aggregation (one partial-agg scan); the model is a table of at most
  ``classes × n_buckets`` rows, broadcastable anywhere.
* :func:`mass_classify` — per class, the add-one-smoothed frequency
  mass ratio ``(Σ_g count_c(g) + 1) / (N_c + V)`` (the multi-class
  generalization of the DSIR score in
  :func:`ariadne_spark.operators.corpus.importance_weights`): one
  integer sum, ONE IEEE division of exact integers — correctly
  rounded, so Spark and DuckDB produce bit-identical doubles and the
  argmax (ties to the smaller class) is oracle-checkable.
* :func:`nb_log_scores` — the classic multinomial Naive Bayes
  log-likelihood ``Σ_g log((count_c(g)+1)/(N_c+V))`` as a library
  extra: transcendental, so it carries no SQL oracle (same policy as
  ``importance_weights(log_weight=True)``) and is pinned by a numpy
  parity test instead.

Scale shape: training is one explode + one partial-aggregatable
groupBy (map-side combine to ≤ classes × n_buckets rows per task).
Classification is a pipelined gram explode, a broadcast join against
the model, a (doc, class) partial agg, and a ``max_by`` argmax — no
window over data, no skew exposure, no driver collect of anything
data-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import gram_bucket
from .text import tokens, word_ngrams


def _doc_buckets(
    df: DataFrame, text_col: str, id_cols: list[str], n: int, n_buckets: int
) -> DataFrame:
    """(id_cols..., __b) — one row per gram occurrence, md5-bucketed.
    The token array materializes once per row (word_ngrams docstring:
    expression trees re-run the split per gram otherwise). Measured:
    repartitioning a one-file toy corpus before this JVM-side kernel
    costs more in exchanges than the extra cores win (unlike the
    Arrow-UDF matmuls in similarity.py, which do use
    ensure_parallelism); at lake scale inputs are many files and the
    scan parallelizes naturally."""
    toked = df.select(
        *[F.col(c) for c in id_cols],
        tokens(text_col).alias("__toks"),
    )
    return toked.select(
        *[F.col(c) for c in id_cols],
        F.explode(
            word_ngrams(text_col, n, tokens_col=F.col("__toks"))
        ).alias("__g"),
    ).select(
        *[F.col(c) for c in id_cols],
        gram_bucket(F.col("__g"), n_buckets).alias("__b"),
    )


def mass_train(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n: int = 1,
    n_buckets: int = 4096,
) -> DataFrame:
    """Hashed n-gram class-count model: ``(label, bucket, cnt)`` with
    exact integer counts. One explode + one partial-agg shuffle.
    NULL-label rows are dropped — a NULL class is unlabeled data, not
    a class (and downstream tie-break maps can't order None against
    real labels; same posture as knn_classify)."""
    grams = _doc_buckets(
        df.where(F.col(label_col).isNotNull()),
        text_col,
        [label_col],
        n,
        n_buckets,
    )
    return grams.groupBy(label_col, F.col("__b").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def mass_classify(
    df: DataFrame,
    model: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    n_buckets: int = 4096,
) -> DataFrame:
    """Classify by the add-one-smoothed frequency-mass ratio
    ``(Σ_g count_c(g) + 1) / (N_c + V)`` — highest ratio wins, ties
    to the smaller label (string or numeric ordering). Returns
    ``(id, pred_label, ratio)`` with the winning ratio rounded to
    6 dp. Exact across engines: integer sums and ONE correctly-rounded
    IEEE division per class.

    Documents with no grams (shorter than ``n`` tokens) score every
    class at its zero-evidence prior ``1/(N_c+V)``, so the smallest
    (N_c) — most-evidence — class wins deterministically; they are
    kept, not dropped."""
    totals = model.groupBy(label_col).agg(
        (F.sum("cnt") + F.lit(n_buckets)).cast("bigint").alias("__den")
    )
    grams = _doc_buckets(df, text_col, [id_col], n, n_buckets)
    # per-(doc, class) evidence: grams join the model on bucket; a
    # gram with no count row for a class contributes 0 there, which
    # the labels × docs re-attach below restores exactly
    sums = (
        grams.join(
            F.broadcast(model.withColumnRenamed("bucket", "__b")), "__b"
        )
        .groupBy(id_col, label_col)
        .agg(F.sum("cnt").cast("bigint").alias("__mass"))
    )
    base = df.select(id_col).crossJoin(F.broadcast(totals))
    scored = base.join(sums, [id_col, label_col], "left").select(
        id_col,
        label_col,
        (
            (F.coalesce(F.col("__mass"), F.lit(0)) + 1).cast("double")
            / F.col("__den").cast("double")
        ).alias("__ratio"),
    )
    # argmax with ties to the smaller label: max_by over
    # (ratio, preference) where preference inverts the label order
    # via a literal map (works for string AND numeric labels; the
    # class set is model-sized, driver-safe by construction) —
    # partial-aggregatable, no window
    # NULL labels are excluded from the preference map: sorted() on
    # mixed None/str raises TypeError, and a NULL class can never be
    # a meaningful prediction (knn_classify filters the same way)
    labels_sorted = sorted(
        r[0]
        for r in model.select(label_col).distinct().collect()
        if r[0] is not None
    )
    pref = F.create_map(
        *[
            x
            for i, lbl in enumerate(labels_sorted)
            for x in (F.lit(lbl), F.lit(len(labels_sorted) - i))
        ]
    )
    win = F.max_by(
        F.struct(F.col(label_col), F.col("__ratio")),
        F.struct(F.col("__ratio"), pref[F.col(label_col)]),
    )
    return (
        scored.groupBy(id_col)
        .agg(win.alias("__win"))
        .select(
            id_col,
            F.col("__win")[label_col].alias("pred_label"),
            F.round(F.col("__win")["__ratio"], 6).alias("ratio"),
        )
    )


def nb_log_scores(
    df: DataFrame,
    model: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    n_buckets: int = 4096,
) -> DataFrame:
    """Multinomial Naive Bayes log-likelihoods per (doc, class):
    ``Σ_g [log(count_c(g)+1) − log(N_c + V)]`` (uniform prior). The
    real NB score — transcendental, so library-only (no SQL oracle;
    numpy-parity-tested). Returns ``(id, label, log_score)``."""
    totals = model.groupBy(label_col).agg(
        (F.sum("cnt") + F.lit(n_buckets)).cast("bigint").alias("__den")
    )
    grams = _doc_buckets(df, text_col, [id_col], n, n_buckets)
    labels = model.select(label_col).distinct()
    # every gram must contribute to EVERY class (log(0+1) for unseen):
    # gram × labels, left-join the model
    gl = grams.crossJoin(F.broadcast(labels)).join(
        F.broadcast(model.withColumnRenamed("bucket", "__b")),
        ["__b", label_col],
        "left",
    )
    per_doc = gl.groupBy(id_col, label_col).agg(
        F.sum(
            F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double"))
        ).alias("__num"),
        F.count(F.lit(1)).alias("__ng"),
    )
    scored = per_doc.join(F.broadcast(totals), label_col).select(
        id_col,
        label_col,
        (
            F.col("__num")
            - F.col("__ng") * F.log(F.col("__den").cast("double"))
        ).alias("log_score"),
    )
    # documents with fewer than n tokens emit no grams and would
    # vanish from the output entirely — keep them at the
    # zero-evidence score 0.0 (Σ over zero grams), matching
    # mass_classify's keep-at-the-prior policy (r06 review finding)
    base = df.select(id_col).crossJoin(F.broadcast(labels))
    return base.join(scored, [id_col, label_col], "left").select(
        id_col,
        label_col,
        F.coalesce("log_score", F.lit(0.0)).alias("log_score"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
) -> DataFrame:
    """Precision/recall calibration table for a quality-classifier
    score against a boolean label: one row per threshold with the
    confusion counts (``tp fp fn tn``) of the rule ``score >=
    threshold`` plus ``precision``/``recall``/``f1`` — how a pipeline
    picks its keep-threshold before gating 100 TB on it.

    Scale shape: ONE corpus scan with 2x|thresholds| conditional
    partial-aggregate sums folded into a single ``df.agg`` (each
    datum contributes to every threshold map-side; nothing is
    exploded, no threshold x row blow-up, no shuffle beyond the
    single-row final agg) — then the one aggregate row is unpivoted
    to |thresholds| rows with ``stack``, a driver-free constant-size
    step. NULL scores and NULL labels are excluded from every count
    (``pos``/``neg`` below), so the table always partitions the
    scored, labeled population.

    Determinism/oracle: counts are exact integers; the three ratios
    are single IEEE divisions of those integers (the one-division
    pattern :func:`mass_classify` uses), so the DuckDB twin is
    bit-exact. Zero-denominator cells yield NULL, not NaN.

    Sizing: calibration grids are typically 10-100 points; each
    threshold adds two aggregate slots to the single projection, and
    Spark's codegen handles hundreds comfortably (janino bails to
    interpreted evaluation beyond ~64 KB of generated code — still
    correct, just slower). For a truly dense grid, bucket the score
    once and cumulative-sum the buckets instead.
    """
    import math

    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if not all(math.isfinite(float(t)) for t in thresholds):
        # a nan/inf literal would render as an unresolvable SQL token
        # in the stack() below — fail fast with a clear message
        raise ValueError(f"thresholds must be finite: {thresholds}")
    s = F.col(score_col)
    y = F.col(label_col).cast("boolean")
    valid = s.isNotNull() & y.isNotNull()

    def zsum(cond) -> Column:
        # sum() over zero rows is NULL; an empty/filtered-to-empty
        # slice must report all-zero confusion counts, not NULLs
        return F.coalesce(
            F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
        ).cast("bigint")

    aggs = []
    for i, t in enumerate(thresholds):
        hit = valid & (s >= F.lit(float(t)))
        aggs.append(zsum(hit & y).alias(f"tp{i}"))
        aggs.append(zsum(hit & ~y).alias(f"fp{i}"))
    aggs.append(zsum(valid & y).alias("pos"))
    aggs.append(zsum(valid & ~y).alias("neg"))
    one = df.agg(*aggs)
    # unpivot: stack(T, lit(t0), tp0, fp0, ...) over the 1-row frame
    parts = []
    for i, t in enumerate(thresholds):
        parts += [f"CAST({float(t)} AS DOUBLE)", f"tp{i}", f"fp{i}"]
    wide = one.select(
        F.expr(
            f"stack({len(thresholds)}, {', '.join(parts)}) "
            "AS (threshold, tp, fp)"
        ),
        "pos",
        "neg",
    )
    tp, fp = F.col("tp"), F.col("fp")
    fn = (F.col("pos") - tp).alias("fn")
    tn = (F.col("neg") - fp).alias("tn")
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(F.col("pos") > 0, tp / F.col("pos"))
    f1 = F.when(
        (2 * tp + fp + (F.col("pos") - tp)) > 0,
        (2 * tp) / (2 * tp + fp + (F.col("pos") - tp)),
    )
    return wide.select(
        "threshold",
        tp.alias("tp"),
        fp.alias("fp"),
        fn,
        tn,
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )
