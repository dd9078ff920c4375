"""Keyword retrieval composed over the engine's exploded-token file
index — the file index IS the inverted index.

Reference parity: the reference's exploded-field indexes
(IndexBuildOperations.scala explodedFieldIndexes path, SURVEY §2.2 P3)
locate files by member value; this module adds the retrieval step a
search workload runs on top: integer term-frequency ranking of the
matching documents. Everything downstream of the locate is exact
integer arithmetic, so the DuckDB oracle is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyword_search(
    index,
    terms: list[str],
    k: int = 10,
    token_col: str = "token",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a keyword set over an exploded-token
    index: rank by distinct terms matched (AND-preference), then
    total occurrences, then ``id`` — a deterministic total order, all
    integers.

    Scale shape — the three-lever search pipeline:

    1. **prune**: ``read_matching`` locates only the FILES whose
       token member-lists contain any query term (the exploded index,
       a real inverted file at the file grain) — on a 100-TB corpus
       the scan starts at the pruned fraction;
    2. **count**: the matching rows collapse through ONE
       partial-aggregatable ``groupBy(id)`` (map-side combine — a hot
       document contributes one partial per task, never a hot
       partition);
    3. **select**: ``orderBy().limit(k)`` compiles to
       ``TakeOrderedAndProject`` (per-task heaps, no global sort —
       the plan contract shared with
       :func:`~ariadne_spark.operators.corpus.select_top_n`).

    ``index`` is an :class:`~ariadne_spark.index.Index` with an
    exploded index exposing ``token_col`` (``add_exploded_index(...,
    as_column=token_col)``).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    hits = index.read_matching({token_col: list(terms)})
    scored = hits.groupBy(id_col).agg(
        F.countDistinct(token_col).cast("bigint").alias("n_terms"),
        F.count(F.lit(1)).cast("bigint").alias("total_hits"),
    )
    return scored.orderBy(
        F.col("n_terms").desc(), F.col("total_hits").desc(), F.col(id_col).asc()
    ).limit(k)
