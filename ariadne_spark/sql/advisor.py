"""Workload-driven index advisor: parse a list of SQL queries (no
execution) and recommend which columns of which tables to index, and
with which index type — the "what should I index?" companion to the
SQL surface.

Heuristics, per (table, column) across the workload:

- appears in ``=`` / ``IN`` WHERE conjuncts → value lookups: suggest
  ``regular`` (exact per-file value sets) or ``bloom`` when the
  estimated distinct count is high (value arrays would trip the
  large-index spill; a bloom stays O(bytes/FPR)),
- appears in ``>=``/``<`` band conjuncts → suggest ``range``,
- appears as an equi-join key → value lookups driven by the other
  side: same regular/bloom choice.

Everything is driver-side plan inspection via Spark's own parser —
the workload is never executed. Cardinality (to pick regular vs
bloom) comes from one optional HLL probe per candidate table
(``estimate_cardinality=True``), the same approx_count_distinct the
build analysis uses.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .surface import (
    _attr_name,
    _cls,
    _literal_value,
    _relation_name,
    _seq_to_list,
    _split_conjuncts,
    _walk,
)

# distinct-count boundary between "store the value array" (regular)
# and "store a bloom filter" — mirrors the large-index spill default
BLOOM_CARDINALITY_THRESHOLD = 500_000


def _tables_and_columns(jplan):
    """All relation names scanned by the plan (bare columns resolve
    against these via the tables= schemas; t.col and alias.col
    qualifiers resolve through relation names and SubqueryAlias
    bindings)."""
    tables = [
        r for r in (_relation_name(n) for n in _walk(jplan)) if r is not None
    ]
    return tables


def advise_indexes(
    queries: list[str],
    spark: SparkSession | None = None,
    tables: dict[str, DataFrame] | None = None,
    estimate_cardinality: bool = False,
) -> DataFrame:
    """Analyze ``queries`` and return one row per recommendation:
    (table, column, suggested, reason, n_queries).

    ``tables`` maps table names to DataFrames for (a) resolving which
    table owns an unqualified column and (b) the optional cardinality
    probe; tables not provided fall back to name-qualification only
    (unresolvable columns are reported with table ``?``).
    """
    from .. import context

    spark = spark or context.get_spark()
    tables = tables or {}
    col_owner = {}
    for t, df in tables.items():
        for c in df.columns:
            col_owner.setdefault(c, set()).add(t)

    # (table, column) -> per-kind sets of query indexes (a query with
    # several conjuncts on one column still counts once)
    votes: dict[tuple[str, str], dict] = defaultdict(
        lambda: {"eq": set(), "band": set(), "join": set()}
    )

    def _owner(name, qualifier, scanned, aliases):
        if qualifier:
            qualifier = aliases.get(qualifier, qualifier)
        if qualifier and qualifier in scanned:
            return qualifier
        owners = col_owner.get(name, set())
        cands = [t for t in scanned if t in owners] or sorted(owners)
        if len(cands) == 1:
            return cands[0]
        if len(scanned) == 1:
            return scanned[0]
        return "?"

    def _attr_parts(expr):
        if _cls(expr) != "UnresolvedAttribute":
            return None, None
        parts = [str(p) for p in _seq_to_list(expr.nameParts())]
        if not parts:
            return None, None
        return parts[-1], (parts[-2] if len(parts) > 1 else None)

    parser = spark._jsparkSession.sessionState().sqlParser()
    for qi, q in enumerate(queries):
        try:
            jplan = parser.parsePlan(q)
        except Exception:
            continue
        scanned = sorted(set(_tables_and_columns(jplan)))
        # alias -> relation bindings (FROM orders o) from SubqueryAlias
        aliases: dict[str, str] = {}
        for n in _walk(jplan):
            if _cls(n) == "SubqueryAlias":
                try:
                    rels = [
                        r
                        for r in (_relation_name(x) for x in _walk(n))
                        if r is not None
                    ]
                    if len(set(rels)) == 1:
                        aliases[str(n.alias())] = rels[0]
                except Exception:
                    pass
        for node in _walk(jplan):
            k = _cls(node)
            if k == "Filter":
                for c in _split_conjuncts(node.condition()):
                    ck = _cls(c)
                    if ck in ("EqualTo", "In"):
                        sides = (
                            [(c.value(), None)]
                            if ck == "In"
                            else [(c.left(), c.right()), (c.right(), c.left())]
                        )
                        for attr, other in sides:
                            name, qual = _attr_parts(attr)
                            if name is None:
                                continue
                            if other is not None and _literal_value(other) is None:
                                continue
                            t = _owner(name, qual, scanned, aliases)
                            votes[(t, name)]["eq"].add(qi)
                    elif ck in (
                        "GreaterThan",
                        "GreaterThanOrEqual",
                        "LessThan",
                        "LessThanOrEqual",
                    ):
                        for attr, other in (
                            (c.left(), c.right()),
                            (c.right(), c.left()),
                        ):
                            name, qual = _attr_parts(attr)
                            if name is None or _literal_value(other) is None:
                                continue
                            t = _owner(name, qual, scanned, aliases)
                            votes[(t, name)]["band"].add(qi)
                    elif ck == "UnresolvedFunction":
                        # Spark 4 parses BETWEEN as an unresolved
                        # between(x, lo, hi) call (same as the pruning
                        # rewriter handles) — a band vote
                        try:
                            fname = str(
                                _seq_to_list(c.nameParts())[-1]
                            ).lower()
                            args = _seq_to_list(c.arguments())
                        except Exception:
                            continue
                        if fname != "between" or len(args) != 3:
                            continue
                        name, qual = _attr_parts(args[0])
                        if name is None or any(
                            _literal_value(a) is None for a in args[1:]
                        ):
                            continue
                        t = _owner(name, qual, scanned, aliases)
                        votes[(t, name)]["band"].add(qi)
            elif k == "Join" and not node.condition().isEmpty():
                for c in _split_conjuncts(node.condition().get()):
                    if _cls(c) != "EqualTo":
                        continue
                    for side in (c.left(), c.right()):
                        name, qual = _attr_parts(side)
                        if name is None:
                            continue
                        t = _owner(name, qual, scanned, aliases)
                        votes[(t, name)]["join"].add(qi)

    # one optional HLL probe per table covering all its candidates
    cardinality: dict[tuple[str, str], int] = {}
    if estimate_cardinality:
        by_table: dict[str, list[str]] = defaultdict(list)
        for (t, c), v in votes.items():
            if t in tables and c in tables[t].columns and (v["eq"] or v["join"]):
                by_table[t].append(c)
        for t, cs in by_table.items():
            row = (
                tables[t]
                .agg(*[F.approx_count_distinct(c).alias(c) for c in set(cs)])
                .collect()[0]
            )
            for c in set(cs):
                cardinality[(t, c)] = row[c]

    rows = []
    for (t, c), v in sorted(votes.items()):
        n_eq, n_band = len(v["eq"]), len(v["band"])
        n_lookup = len(v["eq"] | v["join"])
        n = len(v["eq"] | v["band"] | v["join"])
        if n_band and n_band >= n_lookup:
            sugg, why = "range", f"band predicates in {n_band} query(s)"
        elif n_lookup:
            card = cardinality.get((t, c))
            if card is not None and card > BLOOM_CARDINALITY_THRESHOLD:
                sugg = "bloom"
                why = (
                    f"value lookups in {n_lookup} query(s); "
                    f"~{card} distinct values exceed the array threshold"
                )
            else:
                sugg = "regular"
                why = f"value lookups in {n_lookup} query(s)"
        else:
            continue
        rows.append((t, c, sugg, why, n))

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("table", StringType()),
            StructField("column", StringType()),
            StructField("suggested", StringType()),
            StructField("reason", StringType()),
            StructField("n_queries", LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
