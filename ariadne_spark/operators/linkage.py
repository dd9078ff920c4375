"""Record linkage: blocked fuzzy joins over dirty keys.

A training-data pipeline constantly reconciles entities across noisy
sources (author names, site titles, product strings). The naive match
— every left row against every right row with an edit-distance
predicate — is a cross join Spark can only execute as a nested-loop
(O(L x R) comparisons, one partition pair at a time). The standard
entity-resolution answer is *blocking*: only pairs sharing a cheap
blocking key are ever compared, which turns the match into an
equi-join Catalyst can shuffle/broadcast normally, with the expensive
string metric applied only inside blocks.

Blocking is part of the MATCH CONTRACT, not an approximation layered
on top: two strings in different blocks are defined as non-matches
(the universal ER trade — recall is bounded by the blocking function,
so pick one that survives the typos you care about). That makes the
semantics exactly SQL-expressible, and the oracle twin replays the
same block + verify predicate.

100 TB design notes: each candidate pair shares exactly ONE blocking
key, so the join emits no duplicates and needs no post-dedup. Block
skew (many strings sharing a short prefix) is the main hazard at
scale — raise ``block_prefix``, or pre-salt pathological blocks; AQE's
skew-join splitting also applies since this is a plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "blocking_key",
    "fuzzy_join",
    "reference_store_index",
    "incremental_fuzzy_link",
]


def blocking_key(col: str | Column, block_prefix: int = 3) -> Column:
    """The default blocking function: lowercased, whitespace-trimmed
    first ``block_prefix`` characters. Survives typos anywhere past
    the prefix and case/padding noise; misses a typo INSIDE the
    prefix (a shorter prefix trades skew for recall)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.lower(F.trim(c)), 1, block_prefix)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    block_prefix: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose key strings match fuzzily: same blocking key
    (:func:`blocking_key` over both sides) AND Levenshtein edit
    distance ``<= max_distance`` (case-sensitive, computed on the raw
    strings). Returns left columns then right columns; ``how`` may be
    ``inner`` (matching pairs) or ``left`` (keep unmatched left rows
    with nulls — review-queue shape).

    The length difference of a matching pair is bounded by
    ``max_distance`` automatically (edit distance >= length delta),
    so no separate length band is needed.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"fuzzy_join: how must be inner|left, got {how!r}")
    if left_col not in left.columns:
        raise ValueError(f"fuzzy_join: {left_col!r} missing from left")
    if right_col not in right.columns:
        raise ValueError(f"fuzzy_join: {right_col!r} missing from right")
    lb, rb = "__ariadne_block_l", "__ariadne_block_r"
    l = left.withColumn(lb, blocking_key(left_col, block_prefix))
    # rename collisions on the right get a suffix, mirroring what a
    # SQL twin would alias explicitly
    overlap = [c for c in right.columns if c in left.columns]
    r = right
    for c in overlap:
        r = r.withColumnRenamed(c, f"{c}_r")
    r_col = f"{right_col}_r" if right_col in overlap else right_col
    r = r.withColumn(rb, blocking_key(r_col, block_prefix))
    # threshold form of levenshtein (Spark 3.5+): banded DP that
    # early-exits past the bound (and on length delta alone), instead
    # of filling the full |l|x|r| matrix per candidate pair. Returns
    # the distance when <= bound, -1 otherwise, so ">= 0" is exactly
    # the old "distance <= max_distance" predicate — same pair set.
    cond = (F.col(lb) == F.col(rb)) & (
        F.levenshtein(F.col(left_col), F.col(r_col), int(max_distance))
        >= F.lit(0)
    )
    joined = l.join(r, cond, how)
    return joined.drop(lb, rb)


def _block_expression(ref_col: str, block_prefix: int) -> str:
    """The blocking key as a Spark SQL string — must generate the
    exact expression :func:`blocking_key` builds, because the store
    index blooms THIS and probes compare against it."""
    return f"substring(lower(trim({ref_col})), 1, {int(block_prefix)})"


def reference_store_index(
    spark,
    store_path: str,
    name: str,
    ref_col: str,
    block_prefix: int = 3,
    fpr: float = 1e-6,
    files: list[str] | None = None,
    handle=None,
):
    """Maintain a bloom file-index over a reference-entity store's
    BLOCKING keys — engine-over-pipeline-store #4 (window counts r07,
    URL ledger r08, LSH band keys r09, linkage blocks r10). The store
    rows persist raw entities; the index blooms the DERIVED
    ``blocking_key(ref_col, block_prefix)`` per file (an expression
    bloom), so a dirty batch probes with its own blocking keys and
    reads only the reference files holding a colliding block.

    Call after appends: only files not yet indexed are scanned (the
    engine's J1 left_anti) and files compacted away are dropped.
    ``files`` / ``handle`` serve a micro-batch loop exactly like
    :func:`~ariadne_spark.operators.dedup.signature_store_index`."""
    from .dedup import _bloom_store_index

    schema = None
    if handle is None:
        # only the cold path needs the schema (a reused handle never
        # touches it) — don't pay the store footer read per refresh
        schema = spark.read.parquet(store_path).schema
    return _bloom_store_index(
        spark, store_path, name, schema, "block_key", "reference", fpr,
        files=files, handle=handle,
        expression=_block_expression(ref_col, block_prefix),
    )


def incremental_fuzzy_link(
    new_df: DataFrame,
    store_path: str,
    new_col: str,
    ref_col: str,
    max_distance: int = 2,
    block_prefix: int = 3,
    how: str = "inner",
    store_index=None,
) -> DataFrame:
    """Link a batch of dirty keys against a persisted reference store
    WITHOUT scanning it: snapshot-pin the store's current part files,
    prune them to the batch's blocking keys through ``store_index``
    (when given), and :func:`fuzzy_join` the batch against only the
    surviving files' rows. Per-batch cost is O(batch +
    colliding-block reference) — the crawl-loop shape every
    entity-reconciliation pipeline needs at lake scale.

    Files the index has not seen (appends after the last
    :func:`reference_store_index` refresh) are always read, so a
    lagging index widens the scan, never loses a match. A
    ``store_index`` built for a different blocking function is
    rejected loudly — even on the first call — because probing alien
    blocks would silently prune files holding real matches.
    """
    from .dedup import _prune_snapshot_with_index, _snapshot_files

    spark = new_df.sparkSession
    if store_index is not None:
        cfg = store_index.meta.config_for("block_key")
        expected = _block_expression(ref_col, block_prefix)
        if cfg is None or cfg.expression != expected:
            raise ValueError(
                f"store_index {store_index.name!r} blooms "
                f"{None if cfg is None else cfg.expression!r} but this "
                f"call (ref_col={ref_col!r}, block_prefix={block_prefix}) "
                f"probes {expected!r}; rebuild the index with matching "
                "params"
            )
    files = _snapshot_files(spark, store_path, "reference")
    if not files:
        raise FileNotFoundError(
            f"incremental_fuzzy_link: reference store {store_path} is "
            "missing or empty — a linkage reference is provisioned, not "
            "accumulated, so an empty store is a configuration error"
        )
    if store_index is not None:
        probe = new_df.select(
            blocking_key(new_col, block_prefix).alias("block_key")
        ).distinct()
        files = _prune_snapshot_with_index(
            spark, files, store_index, probe, column="block_key"
        )
    if not files:
        # every reference file positively excluded: no matches by the
        # blocking contract; emit the empty joined shape
        ref = spark.read.parquet(store_path).limit(0)
    else:
        ref = spark.read.parquet(*files)
    return fuzzy_join(
        new_df, ref, new_col, ref_col,
        max_distance=max_distance, block_prefix=block_prefix, how=how,
    )
