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

__all__ = ["blocking_key", "fuzzy_join"]


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
    cond = (F.col(lb) == F.col(rb)) & (
        F.levenshtein(F.col(left_col), F.col(r_col)) <= F.lit(max_distance)
    )
    joined = l.join(r, cond, how)
    return joined.drop(lb, rb)
