"""SQL surface: every index as a queryable view + transparent
file-pruning rewrite for SELECTs and equi-JOINs.

The reference exposes indexes through a DataSourceV2 catalog with a
custom Catalyst optimizer rule that rewrites INNER equi-joins to
pre-pruned reads and pushes EqualTo/In filters down to file-grain
pruning (reference:
src/main/scala/dev/cjfravel/ariadne/catalog/AriadneCatalog.scala:45,
catalog/AriadneJoinRule.scala:65-250, catalog/AriadneScan.scala:50-60).
Python cannot inject Catalyst rules, so this module reproduces the
rule's *semantics* at the API boundary (SURVEY §7.1 strategy):

* ``register_views`` — each index becomes a temp view over the lazy
  full-file read (with temporal dedup, which the reference applies to
  ALL catalog reads — AriadneScan.scala:279-283).
* ``sql(query)`` — parses the query with Spark's own SQL parser
  (through py4j, no third-party parser), walks the unresolved plan
  for (a) WHERE conjuncts ``col = lit`` / ``col IN (lits)`` on
  indexed columns of an index view and (b) equi-join conditions
  between an index view and another subtree. Matching references are
  replaced IN THE PARSED PLAN with file-pruned reads registered under
  per-call unique temp-view names (the join's other side is executed
  to collect join-key values — the same execute-during-optimization
  cost the reference accepts, AriadneJoinRule.scala:43-45); the
  substituted plan is analyzed eagerly and the unique views dropped.
  The shared index views are never redefined, so concurrent ``sql()``
  calls on one session are isolated, and a view referenced by several
  UNION branches / self-join arms prunes per-reference. Any
  parse/extraction surprise falls back to running the unmodified
  query — exactly the reference rule's fallback.

Correctness note: pruning is file-grain and conservative; the
unmodified query text re-applies all row-level predicates on top of
the pruned scan (reference P8 returns ALL filters to Spark).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog as _catalog
from ..index import Index

log = logging.getLogger("ariadne")


# ------------------------------------------------------------ plan helpers

def _dataset_of_rows(spark: SparkSession, logical_plan) -> DataFrame:
    """DataFrame from a Catalyst logical plan via the JVM-internal
    ``Dataset.ofRows`` — version-shimmed because the class moved to
    ``sql.classic`` in Spark 4 (the reference pins the same hazard
    behind per-major helper sources, AriadneInternalHelper)."""
    jvm = spark._jvm
    for ds in (
        lambda: jvm.org.apache.spark.sql.classic.Dataset,  # Spark >= 4
        lambda: jvm.org.apache.spark.sql.Dataset,  # Spark 3.x
    ):
        try:
            jdf = ds().ofRows(spark._jsparkSession, logical_plan)
        except Exception:
            continue
        return DataFrame(jdf, spark)
    raise RuntimeError(
        "no usable Dataset.ofRows entry point in this Spark version"
    )


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _seq_to_list(seq):
    return [seq.apply(i) for i in range(seq.size())]


def _relation_name(node) -> str | None:
    if _cls(node) != "UnresolvedRelation":
        return None
    parts = _seq_to_list(node.multipartIdentifier())
    return ".".join(str(p) for p in parts)


def _split_conjuncts(expr):
    if _cls(expr) == "And":
        yield from _split_conjuncts(expr.left())
        yield from _split_conjuncts(expr.right())
    else:
        yield expr


def _attr_name(expr) -> str | None:
    """Last name part of an UnresolvedAttribute (strips table alias)."""
    if _cls(expr) != "UnresolvedAttribute":
        return None
    parts = _seq_to_list(expr.nameParts())
    return str(parts[-1]) if parts else None


def _literal_value(expr):
    if _cls(expr) != "Literal":
        return None
    # Literal.toString gives Spark SQL literal text; use value() + sql
    v = expr.value()
    if v is None:
        return None
    cname = v.getClass().getSimpleName() if hasattr(v, "getClass") else type(v).__name__
    if cname == "UTF8String":
        return str(v.toString())
    return v


def _equality_filters(cond, indexed: set[str]) -> dict[str, list]:
    """{col: [values]} from EqualTo/In conjuncts on indexed columns."""
    out: dict[str, list] = {}
    for c in _split_conjuncts(cond):
        k = _cls(c)
        if k == "EqualTo":
            for a, b in ((c.left(), c.right()), (c.right(), c.left())):
                name = _attr_name(a)
                if name in indexed:
                    v = _literal_value(b)
                    if v is not None:
                        out.setdefault(name, []).append(v)
        elif k == "In":
            name = _attr_name(c.value())
            if name in indexed:
                vals = [_literal_value(e) for e in _seq_to_list(c.list())]
                if all(v is not None for v in vals):
                    out.setdefault(name, []).extend(vals)
    return out


def _band_filters(cond, range_cols: set[str]) -> dict:
    """{col: Band} from >, >=, <, <= conjuncts on RANGE-indexed
    columns (tightest conjunction per column). Literal-on-left forms
    are mirrored."""
    from ..plans.locate import Band, tighten_band

    acc: dict[str, dict] = {}
    mirror = {
        "GreaterThan": "LessThan",
        "GreaterThanOrEqual": "LessThanOrEqual",
        "LessThan": "GreaterThan",
        "LessThanOrEqual": "GreaterThanOrEqual",
    }
    for c in _split_conjuncts(cond):
        k = _cls(c)
        if k == "UnresolvedFunction":
            # Spark 4 parses `x BETWEEN a AND b` as an unresolved
            # between(x, a, b) call, not two comparisons
            try:
                fname = str(_seq_to_list(c.nameParts())[-1]).lower()
                args = _seq_to_list(c.arguments())
            except Exception:
                continue
            if fname != "between" or len(args) != 3:
                continue
            name = _attr_name(args[0])
            lo, hi = _literal_value(args[1]), _literal_value(args[2])
            if name in range_cols and lo is not None and hi is not None:
                tighten_band(acc.setdefault(name, {}), "GreaterThanOrEqual", lo)
                tighten_band(acc.setdefault(name, {}), "LessThanOrEqual", hi)
            continue
        if k not in mirror:
            continue
        name, v, op = _attr_name(c.left()), _literal_value(c.right()), k
        if name is None:
            name, v, op = _attr_name(c.right()), _literal_value(c.left()), mirror[k]
        if name not in range_cols or v is None:
            continue
        tighten_band(acc.setdefault(name, {}), op, v)
    return {
        col: Band(
            lo=b.get("lo"), hi=b.get("hi"),
            lo_inc=b.get("lo_inc", True), hi_inc=b.get("hi_inc", True),
        )
        for col, b in acc.items()
    }


def _alias_map(jplan, index_names: set[str], walk=_walk) -> dict[str, str]:
    """alias -> index view name, for every SubqueryAlias directly over
    an index relation (plus each view's own name for unaliased refs)."""
    out: dict[str, str] = {}
    for node in walk(jplan):
        if _cls(node) != "SubqueryAlias":
            continue
        ch = _children(node)
        if len(ch) == 1:
            rel = _relation_name(ch[0])
            if rel in index_names:
                try:
                    out[str(node.alias())] = rel
                except Exception:
                    continue
    for n in index_names:
        out.setdefault(n, n)
    return out


def _conjunct_view(
    conjunct, alias_map: dict[str, str], view_cols: dict[str, set]
) -> str | None:
    """The single index view a WHERE conjunct talks about, or None.

    Qualified attributes must map through ``alias_map``; unqualified
    ones must be a column of exactly one index view's schema (if the
    name also lived on a non-index relation the original query would
    be ambiguous and fail analysis on its own, so misattribution can
    never produce a wrong executed answer — pruning is file-grain and
    the full query re-applies every predicate)."""
    views: set[str] = set()
    saw_attr = False
    for x in _walk(conjunct):
        if _cls(x) != "UnresolvedAttribute":
            continue
        saw_attr = True
        parts = [str(p) for p in _seq_to_list(x.nameParts())]
        if len(parts) >= 2:
            v = alias_map.get(parts[-2])
            if v is None:
                return None
            views.add(v)
        else:
            owners = [n for n, cols in view_cols.items() if parts[-1] in cols]
            if len(owners) != 1:
                return None
            views.add(owners[0])
    return views.pop() if saw_attr and len(views) == 1 else None


from contextlib import contextmanager


@contextmanager
def _quiet_analysis_errors(spark):
    """Silence the ERROR-with-stacktrace blob PySpark's exception
    hook emits for every AnalysisException — even CAUGHT ones
    (pyspark/errors/exceptions/base.py `_log_exception` logs through
    the Python loggers named below before the exception reaches the
    caller). The conjunct analysis trial throws-and-catches by
    design; without this, each expected miss dumps a full stacktrace
    into driver logs at ERROR (the r03 bench-log blob)."""
    names = ("SQLQueryContextLogger", "DataFrameQueryContextLogger")
    loggers = [logging.getLogger(n) for n in names]
    prior = [(lg, lg.level, lg.disabled) for lg in loggers]
    try:
        for lg in loggers:
            lg.disabled = True
        yield
    finally:
        for lg, level, disabled in prior:
            lg.setLevel(level)
            lg.disabled = disabled


_NONDET_FNS = {"rand", "randn", "random", "uuid", "shuffle",
               "monotonically_increasing_id"}


def _conjunct_safe_for_probe(conjunct) -> bool:
    """Only deterministic, subquery-free conjuncts may be pushed into
    an executed probe side."""
    for x in _walk(conjunct):
        k = _cls(x)
        if "Subquery" in k or k in ("Exists", "InSubquery", "ListQuery"):
            return False
        if k == "UnresolvedFunction":
            try:
                parts = _seq_to_list(x.nameParts())
                if str(parts[-1]).lower() in _NONDET_FNS:
                    return False
            except Exception:
                return False
    return True


def _ancestor_filter_conjuncts(spark, root, target) -> list:
    """Conjuncts of Filter nodes above ``target`` whose path DOWN to
    ``target`` traverses exclusively Filter and INNER Join nodes (JVM
    identity match — structural equality could pick a twin in another
    branch and steal its filters).

    The barrier is the soundness guard: any other intervening node
    invalidates pushing the conjunct into the probe side. A
    Project/SubqueryAlias/Aggregate may rebind names (an unqualified
    ``rn`` defined as a window alias above the join must not resolve
    against a same-named probe column); a non-inner Join null-extends
    rows, so a conjunct above it (e.g. ``col IS NULL``) filters
    post-extension semantics that the probe must not see. Conjuncts
    accumulated above such a node are dropped; Filters BELOW it still
    accumulate fresh."""
    ihc = spark._jvm.java.lang.System.identityHashCode
    want = ihc(target)

    def search(node, acc):
        if ihc(node) == want:
            return list(acc)
        k = _cls(node)
        if k == "Filter":
            acc = acc + list(_split_conjuncts(node.condition()))
        elif k == "Join":
            try:
                if str(node.joinType().sql()).upper() != "INNER":
                    acc = []
            except Exception:
                acc = []
        else:
            acc = []  # barrier: names may rebind below this node
        for c in _children(node):
            found = search(c, acc)
            if found is not None:
                return found
        return None

    return search(root, []) or []


def _filtered_probe(
    spark: SparkSession, root, join_node, other_side, walk=_walk
) -> tuple[DataFrame, bool]:
    """Execute the probe subtree WITH the ancestor WHERE conjuncts that
    belong to it (the reference's rule runs on the optimized plan where
    Catalyst has already pushed these down; a parse-plan rewriter must
    push them itself or the probe runs unfiltered — unboundedly more
    expensive AND less selective for pruning). A conjunct belongs to
    the probe iff it analyzes against the subtree alone; each is tried
    individually and droppers fall back to the unfiltered side.
    Sound for the INNER joins this rewriter handles: a probe row
    failing a probe-only conjunct cannot appear in any surviving
    output row."""
    conjuncts = [
        c
        for c in _ancestor_filter_conjuncts(spark, root, join_node)
        if _conjunct_safe_for_probe(c)
    ]
    unfiltered = _dataset_of_rows(spark, other_side)
    if not conjuncts:
        return unfiltered, False
    # static attribution first — an analysis trial costs a py4j round
    # trip + full analyzer run, so only UNQUALIFIED references pay it:
    # a conjunct whose attribute qualifiers all name aliases inside
    # the subtree belongs to it; one naming an outside alias does not.
    inside: set[str] = set()
    for x in walk(other_side):
        k = _cls(x)
        if k == "SubqueryAlias":
            try:
                inside.add(str(x.alias()))
            except Exception:
                pass
        elif k == "UnresolvedRelation":
            r = _relation_name(x)
            if r:
                inside.add(r)
    probe_cols = {c.lower() for c in unfiltered.columns}
    kept, uncertain = [], []
    for c in conjuncts:
        quals = []
        unqualified_names = []
        for x in _walk(c):
            if _cls(x) != "UnresolvedAttribute":
                continue
            parts = [str(p) for p in _seq_to_list(x.nameParts())]
            if len(parts) >= 2:
                quals.append(parts[-2])
            else:
                unqualified_names.append(parts[-1])
        if quals and any(q not in inside for q in quals):
            continue  # references something outside the probe
        if unqualified_names:
            # pre-screen: every unqualified name must be an output
            # column of the probe subtree, or the analysis trial below
            # is GUARANTEED to throw — and Spark 4's
            # SQLQueryContextLogger logs every AnalysisException at
            # ERROR with a stacktrace even when the caller catches it
            # (r03 verdict: the `rn <= 2` blob in the bench log)
            if all(n.lower() in probe_cols for n in unqualified_names):
                uncertain.append(c)
        elif quals:
            kept.append(c)
        # no attributes at all (pure literal condition): skip — no gain
    jfilter = spark._jvm.org.apache.spark.sql.catalyst.plans.logical.Filter
    jand = spark._jvm.org.apache.spark.sql.catalyst.expressions.And
    if uncertain:
        with _quiet_analysis_errors(spark):
            for c in uncertain:
                try:
                    # analysis trial (residual: name present but e.g.
                    # ambiguous or type-invalid in the subtree alone)
                    _dataset_of_rows(spark, jfilter(c, other_side))
                    kept.append(c)
                except Exception:
                    continue
    if not kept:
        return unfiltered, False
    cond = kept[0]
    for c in kept[1:]:
        cond = jand(cond, c)
    return _dataset_of_rows(spark, jfilter(cond, other_side)), True


def _join_equi_cols(cond, indexed: set[str]) -> list[tuple[str, str]]:
    """(index_col, other_col) pairs from equi conjuncts; index side
    recognized by membership in ``indexed``."""
    pairs = []
    for c in _split_conjuncts(cond):
        if _cls(c) != "EqualTo":
            continue
        ln, rn = _attr_name(c.left()), _attr_name(c.right())
        if ln in indexed and rn is not None:
            pairs.append((ln, rn))
        elif rn in indexed and ln is not None:
            pairs.append((rn, ln))
    return pairs


# ------------------------------------------------------------ plan rewrite


def _to_seq(spark, items: list):
    """Python list of JVM nodes -> Scala Seq (PythonUtils is the same
    bridge PySpark's own column helpers use)."""
    return spark._jvm.PythonUtils.toSeq(items)


def _substitute_plan(spark, node, subst: dict[str, object],
                     subst_nodes: dict[int, object], children=_children):
    """Rebuild the parsed plan bottom-up, replacing each
    ``UnresolvedRelation`` that is either (a) THE specific reference
    node in ``subst_nodes`` (keyed by the canonical proxy's ``id()`` —
    per-reference pruning of multi-referenced views) or (b) any
    reference of a name in ``subst``, with the mapped node (a
    ``SubqueryAlias(original_name, pruned_unique_view)`` so qualified
    attribute references keep resolving). ``children`` must be the
    per-call memoized accessor so every JVM node has ONE canonical
    proxy and ``id()`` is a stable identity. Untouched subtrees are
    returned as the SAME JVM objects — Spark's cache manager can still
    canonically match a persisted probe side against the final plan.
    Returns ``(new_node, changed)``."""
    rep = subst_nodes.get(id(node))
    if rep is not None:
        return rep, True
    name = _relation_name(node)
    if name is not None:
        rep = subst.get(name)
        return (rep, True) if rep is not None else (node, False)
    kids = children(node)
    if not kids:
        return node, False
    rebuilt = []
    changed = False
    for c in kids:
        nc, ch = _substitute_plan(spark, c, subst, subst_nodes, children)
        rebuilt.append(nc)
        changed = changed or ch
    if not changed:
        return node, False
    return node.withNewChildren(_to_seq(spark, rebuilt)), True


class _RewriteContext:
    """Per-call pruning state. Pruned reads live ONLY under per-call
    unique temp-view names and are substituted into the parsed plan —
    the shared index views are NEVER redefined, so concurrent ``sql()``
    calls on one session cannot observe each other's pruning (the
    reference rule is stateless per-plan, AriadneJoinRule.scala:126-250;
    the previous global view swap could over-prune a racing query)."""

    def __init__(self, spark: SparkSession, parser, token: str,
                 children=_children):
        self.spark = spark
        self.parser = parser
        self.token = token
        self.children = children
        self.subst: dict[str, object] = {}  # view -> replacement node
        # specific reference node (canonical proxy id) -> replacement:
        # per-REFERENCE pruning of multi-referenced views (each UNION
        # branch / self-join arm gets its own pruned unique view — the
        # old global swap could never express this)
        self.subst_nodes: dict[int, object] = {}
        self.unique: dict = {}  # key -> unique temp view
        self.report: dict = {}
        # (name, ordinal-or-None, files): ordinal = DFS preorder index
        # among the plan's references of that name, for cache replay
        self.swaps: list[tuple] = []

    def _replacement(self, key, name: str, df: DataFrame):
        uname = self.unique.get(key)
        if uname is None:
            suffix = name if isinstance(key, str) else f"{name}_r{key[1]}"
            uname = f"ariadne_pruned_{self.token}_{suffix}"
            self.unique[key] = uname
        df.createOrReplaceTempView(uname)
        # SubqueryAlias(name, UnresolvedRelation(uname)) via the
        # session's own parser — no hand-built case-class plumbing
        p = self.parser.parsePlan(f"SELECT * FROM {uname} AS {name}")
        return _children(p)[0]

    def swap(self, name: str, df: DataFrame, files: list[str]) -> None:
        if name not in self.subst:
            self.subst[name] = self._replacement(name, name, df)
        else:
            self._replacement(name, name, df)  # re-swap: redefine view
        self.swaps = [
            s for s in self.swaps if s[0] != name or s[1] is not None
        ] + [(name, None, list(files))]

    def swap_node(self, node, ordinal: int, name: str, df: DataFrame,
                  files: list[str]) -> None:
        """Prune ONE specific reference of a multi-referenced view."""
        key = (name, ordinal)
        rep = self._replacement(key, name, df)
        self.subst_nodes[id(node)] = rep
        self.swaps = [
            s for s in self.swaps if (s[0], s[1]) != (name, ordinal)
        ] + [(name, ordinal, list(files))]

    def substituted(self, node):
        """``node`` with every pruned view substituted (used both for
        probe-side execution — an already-pruned other side executes
        its pruned read — and for the final plan)."""
        if not self.subst and not self.subst_nodes:
            return node
        new, _ = _substitute_plan(
            self.spark, node, self.subst, self.subst_nodes, self.children
        )
        return new

    def drop_views(self) -> None:
        """Analysis is eager in both ``Dataset.ofRows`` and
        ``SparkSession.sql`` — once the result DataFrame exists its
        resolved plan no longer needs the unique views."""
        for uname in self.unique.values():
            try:
                self.spark.catalog.dropTempView(uname)
            except Exception:
                pass
        self.unique = {}

    def clear(self) -> None:
        self.drop_views()
        self.subst.clear()
        self.report.clear()
        self.swaps = []


# ------------------------------------------------------------ public api

_VIEW_CACHE: dict[tuple, tuple] = {}


def _view_fingerprint(idx: Index) -> tuple:
    return (
        idx.table._latest_version(),
        idx.filelist.table._latest_version(),
        idx.fs.mtime(idx.paths.metadata),
    )


def register_views(
    spark: SparkSession, names: list[str] | None = None, force: bool = False
) -> list[str]:
    """Create one temp view per index over its (lazy) full read.

    Registration collects the index's file list, so unchanged indexes
    are skipped via a manifest-version fingerprint — repeated
    ``sql()`` calls don't re-pay a per-index Spark job."""
    names = names if names is not None else _catalog.list_indexes(spark)
    registered = []
    for name in names:
        try:
            idx = Index.for_name(name, spark=spark)
            key = (id(spark), name)
            fp = _view_fingerprint(idx)
            if (
                not force
                and _VIEW_CACHE.get(key) == fp
                and spark.catalog.tableExists(name)
            ):
                registered.append(name)
                continue
            idx.read_all().createOrReplaceTempView(name)
            _VIEW_CACHE[key] = fp
        except Exception as e:
            # one broken index (corrupt metadata, vanished registered
            # files) must not take down SQL over every OTHER table —
            # skip its view; queries touching it fail with a normal
            # table-not-found, everything else runs
            log.warning(
                "ariadne.sql: skipping view %s (%s: %s)",
                name, type(e).__name__, e,
            )
            continue
        registered.append(name)
    return registered


def _raw_sql(spark: SparkSession, query: str) -> DataFrame:
    """The un-intercepted ``SparkSession.sql`` — calling through the
    class dodges the instance attribute ``enable_sql_interception``
    installs, so the rewriter never recurses into itself."""
    return type(spark).sql(spark, query)


# per-view pruning decisions of the LAST sql() call (observability:
# prune_report() renders this as a DataFrame)
_PRUNE_REPORT: dict = {}

# probe-side DataFrames persisted by the LAST sql() call. Executing a
# join's other side during rewrite is the reference's accepted
# execute-during-optimization cost (AriadneJoinRule.scala:43-45), but
# without reuse the final query pays that side AGAIN end-to-end. We
# persist the executed side; Spark's cache manager then substitutes the
# materialized InMemoryRelation for the matching subtree of the final
# query at analysis time (canonicalized-plan match), so each probe side
# is computed once per query. Entries stay alive until the NEXT sql()
# call because the returned DataFrame is lazy — the caller may not have
# consumed it yet when this call returns.
_PROBE_LIVE: list = []

# (filtered?, DataFrame) for each probe side the LAST sql() call
# executed — observability for tests and debugging, never persisted
_PROBE_TRACE: list = []


def _release_probes() -> None:
    while _PROBE_LIVE:
        try:
            _PROBE_LIVE.pop().unpersist()
        except Exception:
            pass


def prune_report(spark: SparkSession | None = None) -> DataFrame:
    """What the last :func:`sql` call pruned, one row per index view it
    rewrote: files/bytes selected vs total and the probed columns.
    Empty when the last query touched no index view (or fell back).

    All numbers come from state the locate path already captured — no
    extra Spark jobs."""
    from .. import context

    spark = spark or context.get_spark()
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("view", T.StringType()),
            T.StructField("files_selected", T.LongType()),
            T.StructField("files_total", T.LongType()),
            T.StructField("bytes_selected", T.LongType()),
            T.StructField("bytes_total", T.LongType()),
            T.StructField("probed_columns", T.StringType()),
        ]
    )
    rows = [
        (
            name,
            r["files_selected"],
            r["files_total"],
            r["bytes_selected"],
            r["bytes_total"],
            ", ".join(r["probed_columns"]),
        )
        for name, r in sorted(_PRUNE_REPORT.items())
    ]
    return spark.createDataFrame(rows, schema)


# Memoized swap decisions: (session, query text, index-view
# fingerprints) -> the per-view pruned file lists + prune report the
# rewrite produced. The registry/bench shape re-issues IDENTICAL SQL
# every pass, and the rewrite's fixed cost (parse walks over py4j,
# probe-side execution, locate jobs) is constant in data size but
# dominates at toy scale (r03: sql_tpch_q5 +21% round-over-round from
# added rewrite machinery). A hit swaps views straight from the cached
# file lists — zero parse, zero probe, zero locate jobs.
#
# Invalidation: the key carries every registered index view's manifest
# fingerprint, so ANY index data/metadata change misses. NOT tracked:
# changes to non-index tables a cached query's JOIN probe side read —
# new probe-side keys could match more index files than the cached
# list. File-grain pruning with re-applied predicates keeps results
# correct for index-side data (unchanged by fingerprint); callers that
# mutate probe-side tables between identical queries should set
# ``spark.ariadne.sqlRewriteCache=false`` or call
# :func:`clear_sql_cache`.
_SWAP_CACHE: dict[tuple, dict] = {}
_SWAP_CACHE_MAX = 256


# Parsed-plan memo: (session, query text) -> (parser, jplan, walkers).
# Parsing + the memoized tree walk cost dozens of py4j round trips per
# call; plans are immutable (substitution builds NEW trees via
# withNewChildren), so identical re-issued queries reuse one canonical
# proxy set. A racing thread may rebuild an entry — last wins, and a
# stale proxy set only causes a missed (fail-open, unpruned-but-
# correct) substitution, never a wrong one.
_PLAN_CACHE: dict[tuple, tuple] = {}
_PLAN_CACHE_MAX = 128


def _parsed(spark: SparkSession, query: str):
    key = (id(spark), query)
    hit = _PLAN_CACHE.get(key)
    if hit is None:
        parser = spark._jsparkSession.sessionState().sqlParser()
        jplan = parser.parsePlan(query)
        walk, rel_names, children = _make_walkers(spark)
        hit = (parser, jplan, walk, rel_names, children)
        if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            try:
                _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
            except (KeyError, StopIteration):
                pass
        _PLAN_CACHE[key] = hit
    return hit


def clear_sql_cache() -> None:
    """Drop all memoized rewrite decisions (see ``_SWAP_CACHE``) and
    parsed plans."""
    _SWAP_CACHE.clear()
    _PLAN_CACHE.clear()


def _cache_enabled(spark: SparkSession) -> bool:
    try:
        raw = spark.conf.get("spark.ariadne.sqlRewriteCache", "true")
    except Exception:
        return True
    return str(raw).lower() != "false"


def _make_walkers(spark: SparkSession):
    """Memoized tree walkers: every ``_walk`` over py4j costs one JVM
    round trip per ``children()`` call, and the join cascade re-walks
    the same subtrees on every pass. Parsed plans are immutable here,
    so node lists cache by the proxy's JVM object id. ``children`` is
    memoized too, which ALSO canonicalizes proxies: every JVM node is
    represented by exactly one Python proxy, so ``id(node)`` is a
    stable identity (per-reference substitution depends on this)."""
    _walk_cache: dict = {}
    _children_cache: dict = {}

    def children(node):
        key = getattr(node, "_target_id", None) or id(node)
        got = _children_cache.get(key)
        if got is None:
            got = _children(node)
            _children_cache[key] = got
        return got

    def walk(node):
        key = getattr(node, "_target_id", None) or id(node)
        got = _walk_cache.get(key)
        if got is None:
            got = [node]
            for c in children(node):
                got.extend(walk(c))
            _walk_cache[key] = got
        return got

    def rel_names(node) -> list[str]:
        key = ("rels", getattr(node, "_target_id", None) or id(node))
        got = _walk_cache.get(key)
        if got is None:
            got = [
                r
                for r in (_relation_name(x) for x in walk(node))
                if r is not None
            ]
            _walk_cache[key] = got
        return got

    return walk, rel_names, children


def sql(query: str, spark: SparkSession | None = None) -> DataFrame:
    """Run ``query`` with transparent index-based file pruning; falls
    back to the unmodified query on any extraction surprise.

    Thread-safe: pruned reads are registered under per-call unique
    temp-view names and substituted into the parsed plan — the shared
    index views are never redefined, so any number of threads may issue
    ``sql()`` on one session concurrently (observability state such as
    :func:`prune_report` is last-call-wins under concurrency). Only
    views the query actually references are registered/fingerprinted —
    per-call overhead no longer grows with catalog size."""
    import uuid

    from .. import context

    spark = spark or context.get_spark()
    _PRUNE_REPORT.clear()
    _PROBE_TRACE.clear()
    _release_probes()  # previous call's result has been consumed by now
    try:
        parser, jplan, walk, rel_names, children = _parsed(spark, query)
    except Exception:
        # let Spark raise its own (identical) parse error
        return _raw_sql(spark, query)
    try:
        by_lower = {n.lower(): n for n in _catalog.list_indexes(spark)}
        referenced = sorted(
            {
                by_lower[r.lower()]
                for r in rel_names(jplan)
                if r.lower() in by_lower
            }
        )
    except Exception:
        referenced = []
    if not referenced:
        return _raw_sql(spark, query)
    index_names = set(register_views(spark, referenced))
    cache_key = (
        id(spark),
        query,
        frozenset(
            (n, _VIEW_CACHE.get((id(spark), n))) for n in sorted(index_names)
        ),
    )
    use_cache = _cache_enabled(spark)
    ctx = _RewriteContext(spark, parser, uuid.uuid4().hex[:12], children)
    try:
        cached = _SWAP_CACHE.get(cache_key) if use_cache else None
        if cached is not None:
            # ordinal -> node map for per-reference replay (same query
            # text parses to the same DFS preorder of references)
            by_ordinal: dict = {}
            counts: dict = {}
            for n in walk(jplan):
                nm = _relation_name(n)
                if nm is None:
                    continue
                by_ordinal[(nm, counts.get(nm, 0))] = n
                counts[nm] = counts.get(nm, 0) + 1
            for name, ordinal, files in cached["swaps"]:
                idx = Index.for_name(name, spark=spark)
                pruned = idx.read_files(files, include_all_virtuals=True)
                if ordinal is None:
                    ctx.swap(name, pruned, files)
                else:
                    node = by_ordinal.get((name, ordinal))
                    if node is not None:
                        ctx.swap_node(node, ordinal, name, pruned, files)
            ctx.report = dict(cached["report"])
        else:
            failed = False
            try:
                _plan_and_swap(
                    spark, jplan, index_names, ctx, walk, rel_names
                )
            except Exception as e:  # fallback = run unmodified (rule parity)
                failed = True
                ctx.clear()
                log.info(
                    "ariadne.sql: no rewrite (%s: %s)", type(e).__name__, e
                )
            if use_cache and not failed:
                record = {"swaps": list(ctx.swaps), "report": dict(ctx.report)}
                if len(_SWAP_CACHE) >= _SWAP_CACHE_MAX:
                    try:
                        _SWAP_CACHE.pop(next(iter(_SWAP_CACHE)))
                    except (KeyError, StopIteration):
                        pass
                _SWAP_CACHE[cache_key] = record
        _PRUNE_REPORT.update(ctx.report)
        if not ctx.subst and not ctx.subst_nodes:
            return _raw_sql(spark, query)
        try:
            new_plan = ctx.substituted(jplan)
            return _dataset_of_rows(spark, new_plan)  # analysis is eager
        except Exception as e:
            log.info(
                "ariadne.sql: substitution fell back (%s: %s)",
                type(e).__name__, e,
            )
            _PRUNE_REPORT.clear()
            return _raw_sql(spark, query)
    finally:
        # eager analysis has resolved the unique views into the
        # returned DataFrame's plan; they are no longer needed
        ctx.drop_views()


def enable_sql_interception(spark: SparkSession) -> None:
    """Make plain ``spark.sql(...)`` go through the pruning rewriter.

    The reference gets transparent SQL integration from a registered
    Catalyst rule + catalog (AriadneSparkExtension.scala:39-42), which
    PySpark cannot install at runtime; the closest Python spelling is
    shadowing ``sql`` on the session instance. Parameterized calls
    (``args``/kwargs) pass straight through — the rewriter only
    handles plain query strings. ``disable_sql_interception`` (or the
    session's end) restores the original.

    Without this, ``register_views`` + plain ``spark.sql`` still give
    CORRECT results — just unpruned full scans.
    """
    if "sql" in spark.__dict__:  # already intercepted
        return

    def patched(query, *a, **kw):
        if a or kw or not isinstance(query, str):
            return _raw_sql_with_args(spark, query, *a, **kw)
        return sql(query, spark)

    def _raw_sql_with_args(s, q, *a, **kw):
        return type(s).sql(s, q, *a, **kw)

    spark.__dict__["sql"] = patched


def disable_sql_interception(spark: SparkSession) -> None:
    spark.__dict__.pop("sql", None)


def _plan_and_swap(
    spark: SparkSession,
    jplan,
    index_names: set[str],
    ctx: _RewriteContext,
    walk,
    rel_names,
) -> None:
    metas = {n: Index.for_name(n, spark=spark) for n in index_names}
    indexed_cols = {
        n: {c.column for c in idx.meta.indexes} for n, idx in metas.items()
    }
    range_cols = {
        n: {c.column for c in idx.meta.indexes if c.type == "range"}
        for n, idx in metas.items()
    }

    # Name-level pruning (one view name -> one pruned read) is only
    # sound when the plan references the view exactly once. A view
    # referenced SEVERAL times (UNION branches, self-joins, a CTE used
    # twice) is instead pruned per-REFERENCE: each Filter whose subtree
    # contains exactly one reference NODE swaps only THAT node for its
    # own pruned unique view (ctx.swap_node) — constraints can never
    # leak across branches. The reference rule refuses multi-relation
    # plans outright; per-reference substitution is a strict
    # improvement with the same conservative semantics. Join-driven and
    # alias-attributed pruning stay single-reference-only.
    from collections import Counter

    ref_counts = Counter(r for r in rel_names(jplan) if r in index_names)
    prunable = {n for n, c in ref_counts.items() if c == 1}
    node_ordinal: dict[int, int] = {}
    ref_node_by_id: dict[int, object] = {}
    _ord_counts: dict[str, int] = {}
    for n in walk(jplan):
        nm = _relation_name(n)
        if nm is None:
            continue
        node_ordinal[id(n)] = _ord_counts.get(nm, 0)
        _ord_counts[nm] = _ord_counts.get(nm, 0) + 1
    for n in set(ref_counts) - prunable:
        log.info(
            "ariadne.sql: view %s referenced %d times; pruning "
            "per-reference only",
            n, ref_counts[n],
        )

    # (a) WHERE pushdown: Filter over a subtree containing exactly one
    # index relation -> prune that index's files by the literal
    # filters. Keys are the view name (single-reference views) or
    # (name, reference node) for per-reference pruning.
    pruned_values: dict = {}
    pruned_frames: dict = {}
    for node in walk(jplan):
        if _cls(node) != "Filter":
            continue
        rel_nodes = [
            x
            for c in ctx.children(node)
            for x in walk(c)
            if _relation_name(x) in index_names
        ]
        if len(rel_nodes) != 1:
            continue
        name = _relation_name(rel_nodes[0])
        # key by the canonical proxy's id(): py4j JavaObject equality
        # is STRUCTURAL (JVM equals/hashCode), so two references of
        # the same view are equal objects and would merge into one key
        if name in prunable:
            key = name
        else:
            key = (name, id(rel_nodes[0]))
            ref_node_by_id[id(rel_nodes[0])] = rel_nodes[0]
        flt = _equality_filters(node.condition(), indexed_cols[name])
        if flt:
            cur = pruned_values.setdefault(key, {})
            for col, vals in flt.items():
                # equality values bound tighter than any Band a prior
                # Filter node contributed — replace, never .extend it
                if not isinstance(cur.get(col), list):
                    cur[col] = []
                cur[col].extend(vals)
        for col, band in _band_filters(
            node.condition(), range_cols[name]
        ).items():
            # literal equality on the same column already bounds the
            # candidate set tighter than any band
            pruned_values.setdefault(key, {}).setdefault(col, band)

    # (a2) multi-view WHERE attribution: a Filter over a subtree with
    # SEVERAL index relations (the normal TPC-H shape — one WHERE above
    # the whole join tree) is skipped above; attribute its conjuncts to
    # index views alias-by-alias instead, so literal/band predicates
    # still prune file sets in multi-view queries.
    view_cols = {
        n: {f.name for f in metas[n].meta.schema.fields} for n in index_names
    }
    amap = _alias_map(jplan, index_names, walk)
    for node in walk(jplan):
        if _cls(node) != "Filter":
            continue
        rels = [
            r
            for c in ctx.children(node)
            for r in rel_names(c)
            if r in index_names
        ]
        if len(rels) <= 1:
            continue  # single-relation Filters handled above
        for conj in _split_conjuncts(node.condition()):
            name = _conjunct_view(conj, amap, view_cols)
            if name is None or name not in prunable:
                continue
            flt = _equality_filters(conj, indexed_cols[name])
            if flt:
                cur = pruned_values.setdefault(name, {})
                for col, vals in flt.items():
                    if not isinstance(cur.get(col), list):
                        cur[col] = []
                    cur[col].extend(vals)
            for col, band in _band_filters(conj, range_cols[name]).items():
                pruned_values.setdefault(name, {}).setdefault(col, band)

    # accumulated join-key frames per view; swapping is monotone
    # refinement (every re-swap only ADDS constraints, and file
    # pruning is conservative, so intermediate states stay correct)
    def _swap_with(key, frames: dict[str, DataFrame]) -> None:
        name = key if isinstance(key, str) else key[0]
        idx = metas[name]
        query_map: dict = dict(pruned_values.get(key, {}))
        for icol, frame in frames.items():
            # a literal constraint on the same column already bounds the
            # candidate set; the frame would only widen it
            query_map.setdefault(icol, frame)
        files = idx.locate_files(query_map)
        pruned = idx.read_files(files, include_all_virtuals=True)
        if isinstance(key, str):
            # last swap per view wins (monotone refinement re-swaps)
            ctx.swap(name, pruned, files)
            label = name
        else:
            rel_node = ref_node_by_id[key[1]]
            ctx.swap_node(
                rel_node, node_ordinal[key[1]], name, pruned, files
            )
            label = f"{name}#{node_ordinal[key[1]]}"
        total_f, total_b = idx._index_totals()
        sizes = idx._last_locate_stats.sizes
        ctx.report[label] = {
            "files_selected": len(files),
            "files_total": int(total_f),
            "bytes_selected": int(sum(sizes.get(f) or 0 for f in files)),
            "bytes_total": int(total_b),
            "probed_columns": sorted(str(c) for c in query_map),
        }
        log.info(
            "ariadne.sql: pruned view %s to %d files via %s",
            label, len(files), sorted(query_map),
        )

    for key in pruned_values:
        _swap_with(key, pruned_frames.setdefault(key, {}))
    swapped: set[str] = {k for k in pruned_values if isinstance(k, str)}
    swapped_keys: set = set(pruned_values)

    # (b) join rewrites, cascaded to fixpoint: Join(cond has
    # indexcol = othercol) prunes its index side by executing the
    # OTHER side and collecting its join-key values (the reference's
    # execute-during-optimization cost, AriadneJoinRule.scala:43-45).
    # A join qualifies once the other side references no index view
    # that is still unpruned — so pruning one view can unlock pruning
    # the next (the reference rule skips index-index joins outright;
    # the cascade is a strict improvement with the same fallback).
    # Multi-referenced views join-prune per-REFERENCE too: a side whose
    # subtree holds exactly one reference NODE of such a view gets a
    # node-level swap — so a self-join of one index view prunes BOTH
    # arms, each by its own join keys.
    def _all_other_refs_swapped(other_side) -> bool:
        for x in walk(other_side):
            nm = _relation_name(x)
            if nm is None or nm not in index_names:
                continue
            if nm in swapped or id(x) in ctx.subst_nodes:
                continue
            return False
        return True
    joins = [
        n
        for n in walk(jplan)
        if _cls(n) == "Join"
        and not n.condition().isEmpty()
        # INNER only — pruning an outer join's preserved side would
        # drop rows (reference constraint, AriadneJoinRule.scala:134-155)
        and str(n.joinType().sql()).upper() == "INNER"
    ]
    done: set[int] = set()
    progress = True
    while progress:
        progress = False
        for i, node in enumerate(joins):
            if i in done:
                continue
            cond = node.condition().get()
            left, right = ctx.children(node)[0], ctx.children(node)[1]
            sides = []
            for idx_side, other_side in ((left, right), (right, left)):
                nodes = [
                    x
                    for x in walk(idx_side)
                    if _relation_name(x) in index_names
                ]
                if len(nodes) != 1 or not _all_other_refs_swapped(other_side):
                    continue
                nm = _relation_name(nodes[0])
                if nm in prunable:
                    key = nm
                else:
                    key = (nm, id(nodes[0]))
                    ref_node_by_id[id(nodes[0])] = nodes[0]
                sides.append((key, other_side))
            # prefer pruning a still-unpruned reference over refining one
            sides.sort(key=lambda s: s[0] in swapped_keys)
            for key, other_side in sides:
                name = key if isinstance(key, str) else key[0]
                pairs = _join_equi_cols(cond, indexed_cols[name])
                if not pairs:
                    continue
                # an already-pruned other side executes its pruned read
                # (substituted, since the shared views stay full);
                # ancestor WHERE conjuncts that belong to the probe are
                # applied to it (filtered probe = cheaper to execute
                # and far more selective keys for pruning)
                other_df, filtered = _filtered_probe(
                    spark, jplan, node, ctx.substituted(other_side), walk
                )
                _PROBE_TRACE.append((filtered, other_df))
                if not filtered:
                    # Unfiltered probe = a subtree the final query also
                    # contains verbatim: persist it so Spark's cache
                    # manager swaps the InMemoryRelation into the final
                    # plan and the probe is computed ONCE end-to-end.
                    # A FILTERED probe can never canonically match the
                    # final plan (its filters live above the join
                    # there), so persisting would only force full-width
                    # materialization during locate — instead it runs
                    # as a narrow filtered scan (column-pruned by the
                    # key projection below) and the final query pays
                    # the full side exactly once.
                    from pyspark.storagelevel import StorageLevel

                    other_df = other_df.persist(StorageLevel.MEMORY_AND_DISK)
                    _PROBE_LIVE.append(other_df)
                frames = pruned_frames.setdefault(key, {})
                added = False
                for icol, ocol in pairs:
                    if ocol not in other_df.columns:
                        continue
                    # keep the key set DISTRIBUTED: locate's regular
                    # path semi-joins against the frame, so any key
                    # cardinality works without a driver collect
                    frame = other_df.select(F.col(ocol).alias(icol))
                    frames[icol] = (
                        frame
                        if icol not in frames
                        else frames[icol].unionByName(frame)
                    )
                    added = True
                if not added:
                    continue
                _swap_with(key, frames)
                if isinstance(key, str):
                    swapped.add(key)
                swapped_keys.add(key)
                done.add(i)
                progress = True
                break
