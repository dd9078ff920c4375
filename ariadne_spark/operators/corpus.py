"""Corpus-management operators for training-data pipelines: splits,
sampling, PII scrubbing, and benchmark-contamination checks.

Everything is deterministic (content/id-hash driven, no RNG) so runs
are reproducible and every operator has an exact ANSI-SQL twin for
the DuckDB oracle. All hot paths are built-in ``pyspark.sql.functions``
(JVM codegen, map-only where possible):

- :func:`deterministic_split` — zero-shuffle projection,
- :func:`quota_sample` — one shuffle on the group column (exact
  per-group quotas need a per-group pass; at lake scale the group
  count is small and AQE handles moderate skew),
- :func:`pii_redact` — zero-shuffle projection,
- :func:`contamination_check` — pipelined gram explode probed
  through a broadcast hash join (the benchmark side is small by
  construction; only MATCHING grams reach the shuffle).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens, word_ngrams

# Hash-bucket granularity for deterministic splits: 3 hex chars of
# md5 = 4096 buckets, so fraction resolution is 1/4096 ≈ 0.024%.
_SPLIT_HEX_CHARS = 3
_SPLIT_BUCKETS = 16**_SPLIT_HEX_CHARS

# PII patterns chosen to parse identically under Java regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(name, upper-bound hex) pairs: a row belongs to the first split
    whose bound its md5 prefix sorts below. Bounds are cumulative
    fractions quantized to the 4096-bucket grid; the last split
    absorbs rounding remainder."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out: list[tuple[str, str]] = []
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        bound = min(round(cum * _SPLIT_BUCKETS), _SPLIT_BUCKETS)
        # bounds compare LEXICOGRAPHICALLY against the 3-hex-char md5
        # prefix; the full-space bound (4096) would format as a 4-char
        # "1000" that sorts BELOW most prefixes and misroute rows, so
        # emit "g" — one past 'f', lexicographically above every
        # possible prefix
        hexb = (
            format(bound, f"0{_SPLIT_HEX_CHARS}x")
            if bound < _SPLIT_BUCKETS
            else "g"
        )
        out.append((name, hexb))
    return out


def split_column(id_col: str | Column, fractions: dict[str, float]) -> Column:
    """The split label as a Column expression: md5 over the stringified
    id, first 3 hex chars compared against cumulative bounds. Pure
    projection — assignment is stable under any repartitioning and
    across engines (md5 hex is lowercase in both Spark and DuckDB)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = F.md5(c.cast("string")).substr(1, _SPLIT_HEX_CHARS)
    pairs = split_thresholds(fractions)
    # evaluate bounds from smallest up so the FIRST matching bound wins
    result = None
    for name, bound in pairs:
        cond = prefix < F.lit(bound)
        result = (
            F.when(cond, F.lit(name))
            if result is None
            else result.when(cond, F.lit(name))
        )
    return result.otherwise(F.lit(pairs[-1][0]))


# 13 hex digits = 52 bits: exactly representable in a double, so the
# per-row bound floor(p * 16^13) is computed identically by Spark and
# DuckDB before the integer-exact string compare
_SOFT_HEX_CHARS = 13
_SOFT_SCALE = 16 ** _SOFT_HEX_CHARS


def soft_filter_column(
    prob_col: str | Column,
    id_col: str | Column = "doc_id",
    seed: str = "",
) -> Column:
    """Boolean keep flag for per-row probabilistic sampling: row ``i``
    survives with probability ``prob_col`` (clamped to [0, 1]), but
    DETERMINISTICALLY — the "draw" is the md5 of (id, seed), so the
    decision is stable across runs, partitionings, and engines
    (CCNet-style soft quality filtering: sample documents in
    proportion to a quality score instead of a hard threshold, with
    full reproducibility and no RNG state).

    Mechanics: the first 13 hex chars of the md5 are a uniform 52-bit
    draw; the bound ``floor(p · 16^13)`` is exactly representable in
    a double, rendered as a zero-padded lowercase hex string, and the
    comparison is LEXICOGRAPHIC on hex strings — integer-exact in
    both engines (the :func:`split_column` idiom with a per-row
    bound). Pure projection, zero shuffle; NULL probabilities yield
    NULL (caller decides); NULL ids yield False UNIFORMLY — a row
    with no identity has no reproducible draw, so it never survives,
    regardless of its probability (the p>=1 short-circuit must not
    resurrect it)."""
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    clamped = F.least(F.greatest(p.cast("double"), F.lit(0.0)), F.lit(1.0))
    bound = F.lpad(
        F.lower(F.hex(F.floor(clamped * F.lit(float(_SOFT_SCALE))))),
        _SOFT_HEX_CHARS,
        "0",
    )
    draw = F.md5(F.concat(c.cast("string"), F.lit(seed))).substr(
        1, _SOFT_HEX_CHARS
    )
    # p == 1.0 would need the 14-char bound '1' + 13 zeros (lpad would
    # TRUNCATE it to 13 and wrongly drop rows) — short-circuit it: full
    # probability keeps everything, no draw consulted
    return (
        F.when(clamped.isNull(), F.lit(None).cast("boolean"))
        .when(c.isNull(), F.lit(False))
        .when(clamped >= 1.0, F.lit(True))
        .otherwise(draw < bound)
    )


def soft_filter(
    df: DataFrame,
    prob_col: str | Column,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Keep each row with its own probability, deterministically —
    see :func:`soft_filter_column`. Rows with NULL probability are
    dropped (no decision basis)."""
    keep = soft_filter_column(prob_col, id_col, seed)
    return df.where(keep)


def deterministic_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a stable train/val/test-style split label by
    hashing its id — the standard reproducible-split primitive of a
    training pipeline (same id ⇒ same split on every run, every
    engine, any partitioning; no RNG, no shuffle)."""
    return df.withColumn(split_col, split_column(id_col, fractions))


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    src: str = "src",
    dst: str = "dst",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe split: every document inherits the split of its
    duplicate-cluster REPRESENTATIVE (the cluster's minimum id via
    distributed connected components over ``pairs``), so two
    near-duplicates can never straddle the train/test boundary — the
    contamination mode plain id-hash splitting permits whenever dedup
    is fuzzy or deliberately partial. Documents in no pair hash their
    own id (identical to :func:`deterministic_split` for them).

    Scale shape: the component table covers only documents appearing
    in ``pairs`` (≪ corpus after upstream dedup), so the attach join
    broadcasts under AQE; the split itself is a pure projection. Split
    SIZES remain ~fractions only while clusters are small relative to
    the corpus — a giant near-dup cluster moves as one unit, which is
    exactly the point.
    """
    from .graph import connected_components

    comp = connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias(id_col), "component"
    )
    joined = df.join(comp, id_col, "left")
    key = F.coalesce(F.col("component"), F.col(id_col))
    return joined.withColumn(
        split_col, split_column(key, fractions)
    ).drop("component")


def temperature_sample(
    df: DataFrame,
    group_col: str,
    budget: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source mixing (the multilingual-corpus
    sampling rule of mBERT/XLM-R/T5): source ``s`` with ``n_s`` rows
    gets a quota proportional to ``n_s**alpha`` — ``alpha=1`` keeps
    natural proportions, ``alpha=0`` gives uniform-by-source,
    in-between up-samples small sources. Quotas are
    ``round(budget * n_s**alpha / Σ n**alpha)`` capped at ``n_s``;
    within a source the quota is filled by the smallest-md5(id) rows
    (deterministic, unbiased, reproducible across runs and engines).

    Two aggregations over the same single hash exchange on
    ``group_col`` (per-source counts are a 1-row-per-source frame the
    quota join broadcasts); the rank is one window over that same
    partitioning. No RNG state and no driver collect — quotas are
    computed IN the plan.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w_sum = counts.agg(
        F.sum(F.pow("__n", F.lit(alpha))).alias("__wsum")
    )
    quotas = counts.crossJoin(F.broadcast(w_sum)).select(
        group_col,
        F.least(
            F.col("__n"),
            F.round(
                F.lit(budget) * F.pow("__n", F.lit(alpha)) / F.col("__wsum")
            ).cast("bigint"),
        ).alias("__quota"),
    )
    sampled = (
        _grid_cum_before(df, group_col, F.lit(1), id_col)
        .join(F.broadcast(quotas), group_col)
        .where(F.col("__cum_before") < F.col("__quota"))
    )
    return sampled.drop("__cum_before", "__quota")


def _grid_cum_before(
    df: DataFrame,
    group_col: str,
    weight: Column,
    id_col: str,
    strata: int | None = None,
) -> DataFrame:
    """``__cum_before`` = the exact running sum of ``weight`` over the
    group's rows that precede this one in (md5(id), id) order —
    skew-safe. A plain ``sum over (partition by group order by md5)``
    sorts a whole group in ONE task (and per-group thresholds are
    column values, so WindowGroupLimit's literal-bound partial top-k
    can never apply). md5's uniformity is a free pre-sort instead:
    rows bucket by their first 3 hex chars into ORDERED strata
    (fixed-width lowercase hex ⇒ prefix order == full-key order), the
    per-(group, stratum) weight sums give each stratum's offset via a
    stratum-count-sized window, and the exact within-stratum running
    sum windows over ~1/strata of the group. Hot groups spread across
    ``strata`` tasks instead of one.

    Stratum count: strata only exist to spread a hot group across
    TASKS, so the right size is a small multiple of the cluster's
    parallelism, not a fixed 4096 — a flat 4096 at toy scale makes
    the offsets frame too big to broadcast and costs ~1 s of fixed
    overhead per call (r06 verdict item 4). Default =
    clamp(8 × defaultParallelism, 64, 4096): 256 on a local[32] dev
    box, the full 4096 on any real cluster. Zero extra jobs (no
    count scan). Override per call (``strata=``) or session-wide via
    ``spark.ariadne.gridStrata``. The stratum count NEVER changes
    results — the running sum is exact in full (md5, id) order for
    any monotone bucketing (parity-tested)."""
    if strata is None:
        conf = df.sparkSession.conf.get("spark.ariadne.gridStrata", None)
        if conf is not None:
            strata = int(conf)
        else:
            par = df.sparkSession.sparkContext.defaultParallelism
            strata = min(4096, max(64, 8 * par))
    strata = max(1, min(4096, int(strata)))
    bucket = F.conv(F.substring(F.col("__rk"), 1, 3), 16, 10).cast("bigint")
    base = df.withColumn(
        "__rk", F.md5(F.col(id_col).cast("string"))
    ).withColumn(
        # monotone fold of the 4096 hex-prefix values onto `strata`
        # buckets — preserves prefix order, so full-key order too
        "__bk", F.floor(bucket * strata / F.lit(4096)).cast("int")
    )
    strata = base.groupBy(group_col, "__bk").agg(
        F.sum(weight).alias("__sw")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = strata.select(
        group_col,
        "__bk",
        F.coalesce(F.sum("__sw").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = (
        Window.partitionBy(group_col, "__bk")
        .orderBy(F.col("__rk"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(offs, [group_col, "__bk"])
        .withColumn(
            "__cum_before",
            (
                F.coalesce(F.sum(weight).over(w_in), F.lit(0))
                + F.col("__off")
            ).cast("bigint"),
        )
        .drop("__rk", "__bk", "__off")
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group quota sample (domain-mixing primitive):
    keep the ``n_per_group`` rows of each group with the smallest
    md5(id) — an unbiased, reproducible pseudo-random choice. One
    shuffle on ``group_col``; rank ties broken by id so the result is
    unique even under md5 collisions. The LITERAL bound lets Spark
    insert WindowGroupLimit (plan-asserted): each map task pre-tops
    n_per_group per group before the shuffle, so hot groups never
    serialize — unlike column-valued quotas, which take the
    _grid_cum_before strata path (see temperature_sample)."""
    from pyspark.sql import Window

    rank_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("__qs_rn", F.row_number().over(w))
        .where(F.col("__qs_rn") <= n_per_group)
        .drop("__qs_rn")
    )


# Curated static snapshot of multi-label public suffixes for
# registrable-domain extraction: the high-traffic entries of the public
# suffix list's ICANN section (ccTLD second levels, US state / CA
# province codes) plus the hosting platforms from the private section a
# web crawl constantly hits (github.io, blogspot.com, ...). The full
# Mozilla PSL is ~9k entries and version-churned — callers needing
# exact-PSL behavior (wildcard rules, exception rules, the long tail)
# pass their own list through the ``two_level_suffixes`` hook; entries
# here may have two OR three labels (label count decides which
# extraction branch they feed).
_US_STATES = [
    "al", "ak", "az", "ar", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy",
]

TWO_LEVEL_SUFFIXES: list[str] = [
    # uk / ie
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk",
    # au (types + state codes)
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au",
    "wa.au",
    # nz
    "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
    "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
    "org.nz", "parliament.nz", "school.nz",
    # jp
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # kr
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr", "seoul.kr",
    "busan.kr", "daegu.kr", "incheon.kr", "gwangju.kr", "daejeon.kr",
    "ulsan.kr", "gyeonggi.kr", "jeju.kr",
    # cn (types + provinces)
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gx.cn",
    "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hl.cn", "hn.cn",
    "jl.cn", "js.cn", "jx.cn", "ln.cn", "nm.cn", "nx.cn", "qh.cn",
    "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn", "tj.cn", "xj.cn",
    "xz.cn", "yn.cn", "zj.cn",
    # tw / hk / sg / my / id / th / ph / vn / in / pk / lk / bd / kh / np
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "mil.tw",
    "idv.tw", "game.tw", "ebiz.tw", "club.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "sch.id", "web.id",
    "my.id", "biz.id", "desa.id", "ponpes.id",
    "co.th", "net.th", "or.th", "go.th", "ac.th", "in.th", "mi.th",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "mil.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn", "int.vn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "nic.in", "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk",
    "biz.pk", "web.pk",
    "com.lk", "net.lk", "org.lk", "gov.lk", "edu.lk", "int.lk",
    "ac.lk", "sch.lk", "soc.lk", "web.lk", "ltd.lk", "grp.lk",
    "com.bd", "net.bd", "org.bd", "gov.bd", "edu.bd", "ac.bd",
    "mil.bd",
    "com.kh", "net.kh", "org.kh", "gov.kh", "edu.kh", "per.kh",
    "mil.kh",
    "com.np", "net.np", "org.np", "gov.np", "edu.np",
    # il / tr / sa / ae / eg
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
    "k12.il", "idf.il",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "k12.tr",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr",
    "info.tr", "mil.tr", "name.tr", "pol.tr", "tel.tr", "tv.tr",
    "web.tr", "kep.tr",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
    "pub.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae",
    "mil.ae",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg",
    "eun.eg", "mil.eg", "name.eg",
    # za / ke / ng / gh / tz
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za",
    "net.za", "nom.za", "org.za", "school.za", "web.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "sch.ng",
    "name.ng", "mobi.ng", "mil.ng", "i.ng",
    "com.gh", "org.gh", "gov.gh", "edu.gh", "mil.gh",
    "co.tz", "ne.tz", "or.tz", "go.tz", "ac.tz", "sc.tz", "info.tz",
    "me.tz", "mil.tz", "mobi.tz", "tv.tz", "hotel.tz",
    # latam
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "adv.br", "blog.br", "eco.br", "esp.br", "far.br",
    "ind.br", "inf.br", "jus.br", "leg.br", "med.br", "mus.br",
    "pro.br", "rec.br", "srv.br", "tur.br", "tv.br", "vet.br",
    "wiki.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "gov.ar", "edu.ar",
    "int.ar", "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve",
    "int.ve", "co.ve", "info.ve", "web.ve",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe",
    "nom.pe",
    "gob.cl", "gov.cl", "mil.cl",
    "com.ec", "net.ec", "org.ec", "gob.ec", "edu.ec", "gov.ec",
    "mil.ec", "info.ec", "fin.ec", "med.ec", "pro.ec",
    "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy", "mil.uy",
    "com.py", "net.py", "org.py", "gov.py", "edu.py", "mil.py",
    "coop.py",
    "com.bo", "net.bo", "org.bo", "gob.bo", "edu.bo", "mil.bo",
    "int.bo", "tv.bo", "web.bo",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "gov.do",
    "mil.do", "sld.do", "art.do", "web.do",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "mil.gt",
    "ind.gt",
    # europe
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "gov.it", "edu.it",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "mil.pl",
    "info.pl", "biz.pl", "waw.pl", "wroc.pl", "krakow.pl",
    "poznan.pl", "lodz.pl", "gda.pl", "gdansk.pl", "szczecin.pl",
    "lublin.pl", "katowice.pl", "bialystok.pl", "olsztyn.pl",
    "torun.pl", "rzeszow.pl",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "kiev.ua", "kyiv.ua", "kharkov.ua", "kharkiv.ua", "lviv.ua",
    "odessa.ua", "odesa.ua", "donetsk.ua",
    "ac.at", "co.at", "gv.at", "or.at",
    "ac.be",
    "com.se", "org.se", "pp.se", "tm.se", "press.se",
    "mil.no", "priv.no",
    # canada (provinces + federal)
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    "gc.ca",
    # us state codes
    *[f"{s}.us" for s in _US_STATES],
    # high-traffic private-section hosting platforms: every user site
    # is a distinct registrant, so they MUST be suffix boundaries or a
    # per-domain quota would collapse all of github.io into one owner
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "appspot.com", "herokuapp.com", "netlify.app", "vercel.app",
    "firebaseapp.com", "web.app", "azurewebsites.net",
    "cloudfront.net", "wordpress.com", "pages.dev", "workers.dev",
    "glitch.me", "readthedocs.io", "onrender.com", "surge.sh",
    "neocities.org", "fly.dev", "deno.dev", "repl.co",
]

# Three-label suffixes: the last THREE labels form the public suffix,
# so the registrable domain keeps four (school.k12.ca.us).
THREE_LEVEL_SUFFIXES: list[str] = [
    # au education is delegated per state
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
    # us schools / community colleges / libraries per state
    *[f"k12.{s}.us" for s in _US_STATES],
    *[f"cc.{s}.us" for s in _US_STATES],
    *[f"lib.{s}.us" for s in _US_STATES],
    # aws resource hostnames (private section)
    "s3.amazonaws.com", "elb.amazonaws.com", "compute.amazonaws.com",
]

# The default snapshot registrable_domain consults: mixed 2- and
# 3-label entries (split by label count at build time).
PUBLIC_SUFFIXES: list[str] = TWO_LEVEL_SUFFIXES + THREE_LEVEL_SUFFIXES


def registrable_domain(
    url_col: str | Column,
    two_level_suffixes: list[str] | None = None,
) -> Column:
    """The registerable domain (eTLD+1) of a URL as a pure-projection
    Column: ``https://a.news.EXAMPLE.co.uk:8080/x?y#z`` →
    ``example.co.uk``. NULL for strings with no ``scheme://host``
    shape. Steps — all portable built-ins (Java regex ∩ RE2, no
    lookaround), so the DuckDB twin is bit-exact:

    1. host = first ``[^/:?#]+`` after ``scheme://`` (userinfo
       stripped, port excluded), lowercased,
    2. drop one leading ``www.`` label,
    3. longest-suffix match against the snapshot
       (:data:`PUBLIC_SUFFIXES` by default): keep four labels when the
       last three form a known 3-label suffix (``k12.ca.us``), three
       when the last two form a known 2-label suffix (``co.uk``), else
       two. ``two_level_suffixes`` overrides the snapshot and may mix
       2- and 3-label entries (label count picks the branch).

    The crawl-pipeline key for domain-level dedup, quotas, and
    ownership stats; composes with the engine's computed index
    columns (sources/files.py) so a domain predicate can PRUNE files
    before any scan.

    Construction cost: with the ~450-entry snapshot, building the
    membership predicates as a Column tree costs one py4j literal
    call PER entry (~0.5 s of driver time per construction — measured
    dominating a streaming micro-batch). For a plain column NAME the
    whole expression is therefore built as one SQL string and parsed
    JVM-side in a single call (~3 ms, identical semantics —
    parity-tested); the tree path remains for Column inputs."""
    if isinstance(url_col, str):
        return F.expr(registrable_domain_sql(url_col, two_level_suffixes))
    host = url_host(url_col)  # shared host parse (one regex to fix)
    host = F.when(host.startswith("www."), F.substring(host, 5, 2_000_000)).otherwise(host)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    last4 = F.concat_ws(
        ".",
        F.element_at(labels, -4),
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    all_suffixes = two_level_suffixes or PUBLIC_SUFFIXES
    suf2 = [s for s in all_suffixes if s.count(".") == 1]
    suf3 = [s for s in all_suffixes if s.count(".") == 2]
    in_two_level = last2.isin(suf2) if suf2 else F.lit(False)
    in_three_level = last3.isin(suf3) if suf3 else F.lit(False)
    is_ipv4 = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    dom = (
        # an IPv4 host has no registerable suffix — it IS the identity
        F.when(is_ipv4, host)
        # longest matching suffix wins (the PSL rule)
        .when((n >= 4) & in_three_level, last4)
        .when((n >= 3) & in_two_level, last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )
    return F.when(host == "", F.lit(None).cast("string")).otherwise(dom)


def registrable_domain_sql(
    url_col: str = "url",
    two_level_suffixes: list[str] | None = None,
) -> str:
    """:func:`registrable_domain` as a Spark-SQL expression STRING —
    the shape ``Index.add_computed_index`` persists, so the domain
    becomes a file-level index column: a crawl store partitioned or
    clustered by site then PRUNES to the matching files before any
    scan ('give me everything from example.co.uk' reads only that
    domain's files). Same semantics as the Column form
    (parity-tested); the textual expansion repeats subexpressions —
    Catalyst's subexpression elimination handles that at codegen."""
    all_suffixes = two_level_suffixes or PUBLIC_SUFFIXES
    suf2 = [s for s in all_suffixes if s.count(".") == 1]
    suf3 = [s for s in all_suffixes if s.count(".") == 2]
    sufs2 = ", ".join(f"'{s}'" for s in suf2) or "''"
    sufs3 = ", ".join(f"'{s}'" for s in suf3) or "''"
    h0 = (
        f"lower(regexp_extract({url_col}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1))"
    )
    host = f"CASE WHEN {h0} LIKE 'www.%' THEN substring({h0}, 5) ELSE {h0} END"
    ls = f"split({host}, '\\\\.')"
    last2 = f"concat_ws('.', element_at({ls}, -2), element_at({ls}, -1))"
    last3 = (
        f"concat_ws('.', element_at({ls}, -3), element_at({ls}, -2), "
        f"element_at({ls}, -1))"
    )
    last4 = (
        f"concat_ws('.', element_at({ls}, -4), element_at({ls}, -3), "
        f"element_at({ls}, -2), element_at({ls}, -1))"
    )
    ipv4 = (
        rf"({host}) RLIKE '^\\d{{1,3}}\\.\\d{{1,3}}\\."
        rf"\\d{{1,3}}\\.\\d{{1,3}}$'"
    )
    return (
        # guard on the POST-www-strip host (matches the Column form:
        # 'http://www./' strips to an empty host and must yield NULL)
        f"CASE WHEN ({host}) = '' THEN CAST(NULL AS STRING) "
        f"WHEN {ipv4} THEN {host} "
        f"WHEN size({ls}) >= 4 AND {last3} IN ({sufs3}) THEN {last4} "
        f"WHEN size({ls}) >= 3 AND {last2} IN ({sufs2}) THEN {last3} "
        f"WHEN size({ls}) >= 2 THEN {last2} "
        f"ELSE {host} END"
    )


def normalized_url(url_col: str | Column) -> Column:
    """Canonical URL key for exact URL-level dedup, as a zero-shuffle
    projection: fragment stripped, scheme+authority lowercased (path
    and query stay case-sensitive per RFC 3986), trailing slashes
    trimmed from the path tail. Portable regex only."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    no_frag = F.regexp_replace(c, "#.*", "")
    head = F.regexp_extract(
        no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
    )
    tail = no_frag.substr(F.length(head) + 1, F.lit(2_000_000))
    key = F.concat(F.lower(head), F.regexp_replace(tail, "/+$", ""))
    return F.when(head == "", F.lit(None).cast("string")).otherwise(key)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact URL-level dedup: one survivor (smallest id) per
    :func:`normalized_url` key — the first pass of every crawl
    pipeline, upstream of content-hash dedup. One partial-agg shuffle
    on the url key (map-side combine keeps only one candidate per key
    per task); rows with NULL url/key are all kept (a missing URL is
    not a duplicate of other missing URLs). Returns the surviving
    rows with their ``url_key``."""
    key = normalized_url(url_col)
    keyed = df.withColumn("url_key", key)
    dup = keyed.where(F.col("url_key").isNotNull())
    keep_ids = dup.groupBy("url_key").agg(F.min(id_col).alias(id_col))
    kept = dup.join(keep_ids, ["url_key", id_col], "leftsemi")
    return kept.unionByName(keyed.where(F.col("url_key").isNull()))


def domain_quota(
    df: DataFrame,
    url_col: str = "url",
    n_per_domain: int = 100,
    id_col: str = "doc_id",
    two_level_suffixes: list[str] | None = None,
) -> DataFrame:
    """Per-registerable-domain quota (the crawl anti-monoculture
    primitive: no single site may contribute more than
    ``n_per_domain`` documents): attach :func:`registrable_domain`,
    then keep each domain's ``n_per_domain`` smallest-md5(id) rows —
    deterministic, unbiased within domain, reproducible across
    engines. NULL-domain rows (no parseable host) are dropped — a
    quota keyed on nothing is meaningless. Scale shape: one shuffle
    on the domain; the LITERAL bound compiles to WindowGroupLimit
    (quota_sample's plan contract), so mega-domains pre-top
    ``n_per_domain`` map-side and never serialize a hot partition."""
    domained = df.withColumn(
        "domain", registrable_domain(url_col, two_level_suffixes)
    ).where(F.col("domain").isNotNull())
    return quota_sample(domained, "domain", n_per_domain, id_col=id_col)


def url_host(url_col: str | Column) -> Column:
    """The lowercased host of a URL (userinfo stripped, port
    excluded) as a pure projection; empty string when the value has
    no ``scheme://host`` shape. Same portable regex as
    :func:`registrable_domain` step 1."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(
        F.regexp_extract(
            c, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1
        )
    )


def host_suffixes(host: Column) -> Column:
    """All label-aligned suffixes of a host, longest first:
    ``a.b.co.uk`` → ``[a.b.co.uk, b.co.uk, co.uk, uk]``. The key set a
    domain blocklist is probed with (an entry blocks a host iff it
    equals one of these). Empty array for an empty host."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    sfx = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )
    return F.when(host == "", F.array().cast("array<string>")).otherwise(sfx)


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose URL host is covered by a domain blocklist
    (UT1-style adult/malware/tracker lists): an entry ``d`` blocks a
    host iff ``host == d`` or ``host`` ends with ``.d`` — i.e. the
    entry matches the host or any parent domain, so ``example.com``
    blocks ``cdn.a.example.com`` and ``ads.example.com`` blocks its
    subdomains without blocking ``example.com`` itself. Rows with no
    parseable host are KEPT (nothing to match).

    Scale shape: the host's ≤ label-count suffix set is probed
    through a broadcast hash join (blocklists are millions of rows —
    ≪ executor memory — while the corpus is the 100-TB side), so
    matching is O(labels) per row with NO comparison against the
    whole list. Only MATCHING ids reach the shuffle of the final
    ``left_anti`` (on a clean corpus, near zero — the same
    matched-rows-only shape as contamination_check); under AQE the
    small blocked-id side broadcasts and the whole filter is
    shuffle-free."""
    host = url_host(url_col)
    cand = df.select(
        F.col(id_col), F.explode(host_suffixes(host)).alias("__d")
    )
    # normalize the list side the same way the host side is: real
    # UT1-style lists carry stray case, whitespace, and trailing dots,
    # and a verbatim entry would silently never match the lowercased
    # host suffixes
    bl = blocklist.select(
        F.regexp_replace(
            F.lower(F.trim(F.col(domain_col))), r"\.$", ""
        ).alias("__d")
    ).distinct()
    blocked = (
        cand.join(F.broadcast(bl), "__d", "leftsemi").select(id_col).distinct()
    )
    return df.join(blocked, id_col, "left_anti")


def pii_redact_columns(text_col: str | Column = "text") -> dict[str, Column]:
    """``redacted`` text plus per-kind and total match counts as
    appendable Columns. Counts are taken on the ORIGINAL text
    (patterns are non-overlapping by construction: the email local
    part may contain digits/dots but redaction order never creates
    new matches — replacements contain no digits or ``@``)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out: dict[str, Column] = {}
    red = c
    for kind, pat, token in PII_PATTERNS:
        out[f"n_{kind}"] = F.size(F.regexp_extract_all(red, F.lit(pat), 0)).cast(
            "bigint"
        )
        red = F.regexp_replace(red, pat, token)
    out["n_redactions"] = sum(
        out[f"n_{k}"] for k, _, _ in PII_PATTERNS
    ).cast("bigint")
    out["redacted"] = red
    return out


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub emails / IPv4s / phone numbers from a text column,
    reporting how many of each were found. Zero-shuffle projection;
    regexes are engine-portable (Java regex ∩ RE2)."""
    cols = pii_redact_columns(text_col)
    return df.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def contamination_check(
    df: DataFrame,
    bench: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark-contamination scan: for each corpus document, count
    how many of its distinct word ``n``-grams appear anywhere in the
    benchmark set; rows with ``n_hits > 0`` are flagged.

    Scale shape: the benchmark side is aggregated to ONE row holding
    the distinct-gram array and broadcast; the corpus side is a
    map-only ``array_intersect`` per document — the 100-TB side is
    never exploded or shuffled. Benchmark gram sets beyond broadcast
    size should be pre-bucketed (out of scope here — real benchmark
    suites are ≪ executor memory)."""
    bcol = bench_text_col or text_col
    bench_grams = bench.select(
        F.explode(F.array_distinct(word_ngrams(bcol, n))).alias("__g")
    ).distinct()
    # Explode the corpus's distinct grams and probe them through a
    # broadcast hash join: O(1) per gram. (An array_intersect against
    # a broadcast gram ARRAY re-builds the benchmark hash set per
    # corpus row — measured 10x slower than the join at sf0.1.) The
    # explode is pipelined (no materialization), the count aggregates
    # map-side, and only MATCHING grams reach the shuffle — on a
    # clean 100-TB corpus the shuffled volume is near zero.
    from .text import tokens
    from .util import ensure_parallelism

    # Tokenize ONCE into a materialized column; building grams
    # straight from text would re-run the regex split per element_at
    # (see word_ngrams docstring). The gram pass is explode-ONLY:
    # emitting size(grams) and explode(grams) from one projection
    # duplicates the gram expression into the Generate operator and
    # measured ~15x slower.
    def _grams(src: DataFrame) -> Column:
        return F.array_distinct(
            word_ngrams(text_col, n, tokens_col=F.col("__toks"))
        )

    corpus_toks = ensure_parallelism(df).select(
        F.col(id_col), F.col(text_col), tokens(text_col).alias("__toks")
    )
    grams = corpus_toks.select(
        F.col(id_col), F.explode(_grams(corpus_toks)).alias("__g")
    )
    hits = (
        grams.join(F.broadcast(bench_grams), "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    # n_grams only for the (rare) contaminated docs: the broadcast
    # join filters the second pass down to matched rows before the
    # gram expression runs again — on a clean corpus this reads
    # nearly nothing.
    return corpus_toks.join(F.broadcast(hits), id_col).select(
        id_col,
        F.col("n_hits"),
        F.size(_grams(corpus_toks)).cast("bigint").alias("n_grams"),
    )


def dedup_against(
    df: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
) -> DataFrame:
    """Cross-corpus exact dedup: drop rows of ``df`` whose
    whitespace/case-normalized text appears anywhere in ``ref`` — the
    "dedup the new crawl against the existing corpus" primitive that
    complements within-corpus dedup.

    Scale shape: one hash anti-join on the normalized key. The
    reference side is reduced to DISTINCT keys first; under AQE a
    small reference broadcasts, a large one shuffles both sides once.
    ``df`` (the 100-TB side) is never exploded or widened — the key
    is a projection column dropped on the way out."""
    def norm(c: str) -> Column:
        return F.regexp_replace(F.lower(F.trim(F.col(c))), r"\s+", " ")

    keyed = df.withColumn("__xk", norm(text_col))
    ref_keys = ref.select(norm(ref_text_col or text_col).alias("__xk")).distinct()
    return keyed.join(ref_keys, "__xk", "left_anti").drop("__xk")


def shard_column(
    id_col: str | Column, n_shards: int, seed: str = ""
) -> Column:
    """Deterministic shard id in ``[0, n_shards)`` from the md5 bucket
    space used by :func:`split_column` (4096 buckets → shard by range
    scaling, so shard sizes are balanced to bucket granularity). Pure
    projection; stable across engines, runs, and partitionings."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = F.md5(F.concat(c.cast("string"), F.lit(seed))).substr(
        1, _SPLIT_HEX_CHARS
    )
    bucket = F.conv(prefix, 16, 10).cast("long")
    return F.floor(bucket * n_shards / F.lit(float(_SPLIT_BUCKETS))).cast("int")


def shard_assignment(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Shard id + deterministic within-shard position for training-data
    export: the md5-ranked order is a reproducible global shuffle (same
    rows ⇒ same shard files in the same order on any cluster), which is
    what a training run needs to resume mid-epoch. One shuffle on the
    shard id; position ties broken by id so the order is total even
    under md5 collisions."""
    from pyspark.sql import Window

    rank = F.md5(F.col(id_col).cast("string"))
    out = df.withColumn(shard_col, shard_column(id_col, n_shards))
    w = Window.partitionBy(shard_col).orderBy(rank, F.col(id_col))
    return out.withColumn(pos_col, F.row_number().over(w).cast("bigint"))


def write_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    shard_col: str = "shard",
    pos_col: str = "pos",
    format: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` deterministic shards
    (``out_dir/shard=K/``), each internally ordered by the reproducible
    shuffle position. One repartition on the shard id, files written
    directly from the shard partitions — no second pass, no global
    sort. ``format``: ``parquet`` (default) or ``json`` — JSONL shards
    are what tokenizer/training loaders commonly stream; the layout
    and ordering contract is identical."""
    if format not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format: {format}")
    assigned = shard_assignment(df, n_shards, id_col, shard_col, pos_col)
    writer = (
        assigned.repartition(n_shards, F.col(shard_col))
        .sortWithinPartitions(shard_col, pos_col)
        .write.partitionBy(shard_col)
        .mode("overwrite")
    )
    writer.format(format).save(out_dir)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str | Column,
    capacity: int,
    n_shards: int = 32,
    shard_col: str | Column | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing: assign each document a
    position in a stream of fixed-``capacity`` training contexts.

    The corpus is split into ``n_shards`` deterministic shards
    (``id % n_shards`` for integral ids — override with
    ``shard_col``); within a shard, documents are concatenated in
    ``id_col`` order and the stream is cut every ``capacity`` tokens,
    exactly the packing GPT-style pretraining applies (documents may
    straddle a context boundary; the trainer splits them at read
    time). Output columns:

    - ``shard``        — the shard id,
    - ``bin_seq``      — 0-based context index within the shard,
    - ``bin_offset``   — token offset of this doc inside that context,
    - ``end_bin_seq``  — context index where the doc's last token
      lands (> ``bin_seq`` when the doc straddles boundaries).

    Scale shape: packing is embarrassingly parallel across shards —
    ONE hash shuffle on ``shard``, then a per-shard sort + running
    sum (a single window spec). A global (unsharded) cumulative sum
    would serialize the whole corpus through one task; real pipelines
    shard exactly like this and feed one shard stream per data-loader
    worker. Deterministic: same input → same packing, any cluster
    size.
    """
    nt = F.col(n_tokens_col) if isinstance(n_tokens_col, str) else n_tokens_col
    if shard_col is None:
        shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("bigint")
    else:
        shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        nt.cast("bigint").alias("__nt"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset_before = F.coalesce(F.sum("__nt").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        F.floor(offset_before / capacity).alias("bin_seq"),
        F.pmod(offset_before, F.lit(capacity)).alias("bin_offset"),
        F.floor(
            (offset_before + F.greatest(F.col("__nt"), F.lit(1)) - 1)
            / capacity
        ).alias("end_bin_seq"),
        F.col("__nt").alias("n_tokens"),
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    max_docs: int = 1,
) -> DataFrame:
    """C4-style line-level dedup: drop every line that occurs in more
    than ``max_docs`` distinct documents (boilerplate: navbars, cookie
    banners, license headers), reassemble each document's surviving
    lines in their original order, and drop documents left empty.

    Scale shape (the line table is |corpus| x avg-lines rows, so every
    stage must stay partial-agg friendly):

    1. ``posexplode`` the split text — pipelined, no shuffle.
    2. One hash shuffle on the line for the distinct-doc count
       (two-phase count distinct, map-side partial).
    3. The over-threshold line set is the *boilerplate* set — small
       on real corpora — so the anti-join broadcasts under AQE; a
       pathological corpus degrades to a shuffle join, never a
       driver collect.
    4. One hash shuffle on ``id_col`` to reassemble (collect_list of
       (pos, line) structs, sorted in-executor by ``array_sort``).
    5. Join surviving text back to the input row (drops emptied docs
       via the inner join); AQE broadcasts whichever side shrank.

    Deterministic: line order is restored from ``posexplode``
    positions, never from shuffle arrival order.
    """
    # F.split takes a REGEX; array_join below uses delim literally —
    # \Q...\E quoting keeps metacharacter delimiters ('|', '.') exact
    split_pat = "\\Q" + delim + "\\E"
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), split_pat)).alias(
            "__pos", "__line"
        ),
    )
    boilerplate = (
        lines.groupBy("__line")
        .agg(F.count_distinct(F.col(id_col)).alias("__docs"))
        .where(F.col("__docs") > max_docs)
        .select("__line")
    )
    kept = lines.join(boilerplate, "__line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            delim,
        ).alias(text_col)
    )
    return df.drop(text_col).join(rebuilt, id_col, "inner")


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary statistics: per term, total occurrences
    (``tf``) and distinct-document frequency (``df``) — the input to
    vocabulary building, stopword harvesting, and domain drift checks.

    One explode (pipelined) + one hash shuffle on the term with
    map-side partial aggregation; ``df`` is a two-phase exact count
    distinct. No driver-side state: top-N selection composes as an
    ordinary ``orderBy().limit()`` (Spark runs TakeOrdered, which
    only ships each partition's top N)."""
    terms = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    return terms.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.count_distinct(F.col(id_col)).alias("df"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking (RAG / pretraining context
    prep): split each document's whitespace tokens into windows of
    ``chunk_tokens`` advancing by ``chunk_tokens - overlap``, so
    consecutive chunks share ``overlap`` tokens. The final window is
    the remainder (never empty, never duplicated).

    Output: (id, chunk_seq, chunk_text, n_tokens) — one row per chunk,
    chunk_seq 0-based in document order.

    Scale shape: pure built-ins (split → sequence → transform/slice →
    posexplode), zero shuffles — a map-only projection whatever the
    corpus size. Deterministic."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - chunk, 0) / step)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(step)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * step + 1, chunk_tokens),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_seq", "__ctoks"),
    )
    return out.select(
        id_col,
        F.col("chunk_seq").cast("bigint").alias("chunk_seq"),
        F.array_join("__ctoks", " ").alias("chunk_text"),
        F.size("__ctoks").cast("bigint").alias("n_tokens"),
    )


def budget_sample(
    df: DataFrame,
    group_col: str,
    budget_tokens: int | dict[str, int],
    n_tokens_col: str | Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget mixture sampling: per ``group_col`` (source,
    domain, language, ...), keep an unbiased md5-ranked subset of
    documents until the group's token budget is met — the data-mixture
    primitive that turns "web 60%, code 25%, books 15% of N tokens"
    into a concrete, reproducible document keep-set.

    A document is kept while the cumulative token count of the
    already-kept documents before it (in md5-of-id order) is below the
    group's budget, so each group overshoots by at most one document —
    the standard closed-form cut, deterministic on any cluster.
    ``budget_tokens`` is one global number or a per-group dict
    (groups absent from the dict keep everything).

    Scale shape (r06): the exact running sum comes from
    :func:`_grid_cum_before` — md5-strata offsets + within-stratum
    windows — so a pathological single-domain corpus spreads across
    4096 tasks instead of sorting in one. Result rows and
    ``cum_tokens`` values are identical to the plain group window.
    """
    nt = (
        F.col(n_tokens_col) if isinstance(n_tokens_col, str) else n_tokens_col
    ).cast("bigint")
    if isinstance(budget_tokens, dict):
        budget = None
        for name, b in sorted(budget_tokens.items()):
            cond = F.col(group_col) == name
            budget = (
                F.when(cond, F.lit(b))
                if budget is None
                else budget.when(cond, F.lit(b))
            )
        budget = budget.otherwise(F.lit(None)).cast("bigint")
    else:
        budget = F.lit(int(budget_tokens)).cast("bigint")
    return (
        _grid_cum_before(df, group_col, nt, id_col)
        .where(budget.isNull() | (F.col("__cum_before") < budget))
        .withColumn("cum_tokens", (F.col("__cum_before") + nt).cast("bigint"))
        .drop("__cum_before")
    )


def ngram_stats(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus n-gram frequency table: per word ``n``-gram, total
    occurrences (``tf``) and distinct-document frequency (``df``) —
    the heavy-hitter input for boilerplate mining, template detection,
    and the bigram-LM vocabulary. ``orderBy(tf desc).limit(N)``
    composes as TakeOrdered (each partition ships only its top N).

    Same shape as :func:`vocab_stats` one level up: tokenize once
    into a materialized array, one pipelined explode, one hash shuffle
    with map-side partial aggregation; ``df`` is a two-phase exact
    count distinct. Zero driver-side state."""
    toks = df.select(
        F.col(id_col), F.col(text_col), tokens(text_col).alias("__toks")
    )
    grams = toks.select(
        F.col(id_col),
        F.explode(
            word_ngrams(text_col, n, tokens_col=F.col("__toks"))
        ).alias("gram"),
    )
    return grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct(F.col(id_col)).alias("df"),
    )


def gram_bucket(gram: str | Column, n_buckets: int) -> Column:
    """Deterministic hash bucket in ``[0, n_buckets)`` for an n-gram:
    24-bit md5 prefix mod bucket count. Portable across engines
    (DuckDB: ``('0x' || substr(md5(g),1,6))::BIGINT % n``)."""
    g = F.col(gram) if isinstance(gram, str) else gram
    return F.pmod(
        F.conv(F.substring(F.md5(g.cast("binary")), 1, 6), 16, 10).cast(
            "long"
        ),
        F.lit(n_buckets),
    ).cast("int")


def importance_weights(
    df: DataFrame,
    target: DataFrame | Column,
    n: int = 2,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str | None = None,
    log_weight: bool = False,
) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): score every corpus document by how much its
    hashed n-gram profile looks like the ``target`` domain relative to
    the corpus itself — the data-selection primitive for "pick the N
    corpus documents most like Wikipedia/books/code".

    Per document:

    - ``n_grams``         — word ``n``-gram occurrences,
    - ``sum_target``      — Σ over its grams of the target corpus's
      bucket frequency,
    - ``sum_background``  — same against the corpus itself,
    - ``score``           — add-one-smoothed frequency-mass ratio
      ``round(((sum_target+1)·Nb) / ((sum_background+1)·Nt), 6)``
      with ``Nt``/``Nb`` the total gram masses; > the corpus median
      means target-like. A pure-arithmetic analogue of the DSIR
      log-likelihood ratio — monotone in the same aggregate evidence
      but bit-exact across engines (no transcendentals), so it is
      oracle-checkable. ``log_weight=True`` appends ``log_ratio``,
      the paper's per-gram sum
      ``Σ_g [log((ct+1)/(Nt+V)) − log((cb+1)/(Nb+V))]`` — the real
      resampling weight, excluded from oracle checks (libm drift).

    Scale shape: both frequency tables aggregate map-side to ≤
    ``n_buckets`` rows in ONE union job and collect to the driver;
    scoring is then a SINGLE zero-shuffle projection — the frequency
    tables ship as two ``n_buckets``-long literal arrays and each
    document folds its own bucket array against them
    (``F.transform`` + ``F.aggregate``). No explode, no join, no
    groupBy: the 100-TB side never shuffles at all, and the output
    pipelines directly into :func:`select_top_n`'s
    TakeOrderedAndProject. Deterministic: md5 buckets, integer
    counts.

    ``target`` accepts a DataFrame (its own corpus — possibly a
    different table) OR a boolean Column over ``df`` ("the target is
    the subset of this corpus matching the predicate"): the predicate
    form computes BOTH frequency tables in a SINGLE corpus scan —
    each gram carries a membership tag and one partial agg yields
    (target count, background count) together. At 100 TB that halves
    the frequency pass; prefer it whenever the target is a slice of
    the corpus being scored."""
    bcol = target_text_col or text_col

    def bucket_grams(src: DataFrame, col: str, tag) -> DataFrame:
        toks_df = src.select(col, tag.alias("__t"), tokens(col).alias("__toks"))
        grams = toks_df.select(
            F.col("__t"),
            F.explode(
                word_ngrams(col, n, tokens_col=F.col("__toks"))
            ).alias("__g"),
        )
        return grams.select(
            gram_bucket(F.col("__g"), n_buckets).alias("__b"), "__t"
        )

    # BOTH frequency tables in one job and one partial-agg shuffle —
    # no bucket-table join stage (r06 verdict item 5: the residual
    # 1.6× was fixed job overhead, not data). DataFrame target: the
    # target grams join the union tagged 1 and cb = total − ct.
    # Column target (predicate): ONE scan — ct = Σ tag, cb = count of
    # ALL corpus grams, identical numbers by construction. The driver
    # materializes the ≤n_buckets-row table ONCE: the scoring plan
    # and the totals both read it, and an unpersisted lookup would
    # re-run the gram aggregations per reference (measured 2.5× on
    # the sf0.1 bench).
    if isinstance(target, Column):
        tagged = bucket_grams(
            df,
            text_col,
            F.when(target, F.lit(1)).otherwise(F.lit(0)),
        )
        agg = tagged.groupBy("__b").agg(
            F.sum("__t").cast("bigint").alias("__ct"),
            F.count(F.lit(1)).cast("bigint").alias("__cb"),
        )
    else:
        tagged = bucket_grams(target, bcol, F.lit(1)).unionByName(
            bucket_grams(df, text_col, F.lit(0))
        )
        agg = tagged.groupBy("__b").agg(
            F.sum("__t").cast("bigint").alias("__ct"),
            (F.count(F.lit(1)) - F.sum("__t")).cast("bigint").alias("__cb"),
        )
    freq_rows = [(r["__b"], r["__ct"], r["__cb"]) for r in agg.collect()]
    nt = sum(r[1] for r in freq_rows)
    nb = sum(r[2] for r in freq_rows)
    # the two frequency tables as bucket-indexed LITERAL arrays: a
    # 4096-long Literal is one plan node, so the scoring side is a
    # pure per-row projection (r06 verdict item 5 — the previous
    # explode + broadcast-join + groupBy(id) shape cost an extra scan
    # plus an id shuffle; measured 0.31 s vs 0.85 s for the scoring
    # job at sf0.1, exact result parity)
    ct_arr = [0] * n_buckets
    cb_arr = [0] * n_buckets
    for b, c_t, c_b in freq_rows:
        ct_arr[b] = c_t
        cb_arr[b] = c_b
    # SQL-text array literals, NOT F.lit(list): classic PySpark builds
    # lit(list) as one py4j round-trip per element (~2-3 s for 4096,
    # measured) while one F.expr string parses JVM-side in ~5 ms
    ct_lit = F.expr("array(" + ",".join(f"{v}L" for v in ct_arr) + ")")
    cb_lit = F.expr("array(" + ",".join(f"{v}L" for v in cb_arr) + ")")
    zero = F.lit(0).cast("bigint")
    toks_df = df.select(
        F.col(id_col), F.col(text_col), tokens(text_col).alias("__toks")
    )
    # bucket ids materialize once per gram (attribute reference), so
    # the md5 runs once even though two folds read the array
    bks_df = toks_df.select(
        F.col(id_col),
        F.transform(
            word_ngrams(text_col, n, tokens_col=F.col("__toks")),
            lambda g: gram_bucket(g, n_buckets),
        ).alias("__bks"),
    )
    n_grams = F.size("__bks").cast("bigint")
    sum_target = F.aggregate(
        "__bks", zero, lambda a, i: a + F.element_at(ct_lit, i + 1)
    )
    sum_background = F.aggregate(
        "__bks", zero, lambda a, i: a + F.element_at(cb_lit, i + 1)
    )
    # short documents (< n tokens have an EMPTY __bks, never null —
    # word_ngrams' contract) fold to zero evidence, where the add-one
    # formula below degenerates to ((0+1)·Nb)/((0+1)·Nt) = the
    # smoothed prior ratio Nb/Nt: short docs are treated neutrally,
    # not as maximally-background-like. log_ratio's zero-gram sum is
    # legitimately 0. An empty corpus (no grams anywhere) has no
    # prior; 0.0 then. Rounding stays in Spark (F.round is HALF_UP;
    # Python's round is banker's) so the oracle contract is
    # byte-identical to the pre-rewrite operator.
    if nt > 0:
        score = F.round(
            ((F.col("sum_target") + 1).cast("double") * F.lit(float(nb)))
            / ((F.col("sum_background") + 1).cast("double") * F.lit(float(nt))),
            6,
        )
    else:
        score = F.lit(0.0)
    out_cols = [
        F.col(id_col),
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("sum_target").cast("bigint").alias("sum_target"),
        F.col("sum_background").cast("bigint").alias("sum_background"),
        score.alias("score"),
    ]
    mid_cols = [
        F.col(id_col),
        n_grams.alias("n_grams"),
        sum_target.alias("sum_target"),
        sum_background.alias("sum_background"),
    ]
    if log_weight:
        v = float(n_buckets)
        # per-gram transcendental part folds over the same bucket
        # array; the constant term is n_grams · (log(Nb+V) − log(Nt+V))
        log_fold = F.aggregate(
            "__bks",
            F.lit(0.0),
            lambda a, i: a
            + F.log((F.element_at(ct_lit, i + 1) + 1).cast("double"))
            - F.log((F.element_at(cb_lit, i + 1) + 1).cast("double")),
        )
        const = F.lit(math.log(float(nb) + v) - math.log(float(nt) + v))
        mid_cols.append(
            (log_fold + n_grams.cast("double") * const).alias("log_ratio")
        )
        out_cols.append(F.col("log_ratio"))
    return bks_df.select(*mid_cols).select(*out_cols)


def mix_report(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-mixture report: per group (source × language by
    default) document/token/char totals plus each group's share of
    all tokens in integer parts-per-million.

    This is the audit table a training-data pipeline reads before
    setting mixture weights (and what :func:`temperature_sample` /
    :func:`budget_sample` act on). ``token_share_ppm`` is computed
    with integer division — ``(1 000 000 · group_tokens) DIV
    total_tokens`` — so the DuckDB oracle is bit-exact.

    Shape at scale: ONE corpus scan — a partial-aggregatable groupBy
    on the (low cardinality) mixture key, map-side combine reducing
    each task to one row per group. The grand total is a window over
    the AGGREGATED frame (bounded by mixture-key cardinality, not
    data), so the corpus is never scanned twice; an
    ``agg``-and-rejoin total would re-run the scan because the
    unpersisted aggregate is not shared between plan branches."""
    per = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(text_col))).cast("bigint").alias("n_tokens"),
        F.sum(F.length(text_col)).cast("bigint").alias("n_chars"),
    )
    tot = F.sum("n_tokens").over(Window.partitionBy())
    # the multiply runs in DECIMAL(38): a bigint 1000000·n_tokens
    # wraps silently past ~9.2e12 tokens per group — exactly the
    # 100 TB scale this report targets (r06 review finding; DuckDB
    # computes the twin in HUGEINT, so overflow would also be a
    # silent oracle divergence)
    share = F.expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_tokens) DIV __tot AS BIGINT)"
    )
    return per.withColumn("__tot", tot).select(
        *group_cols,
        "n_docs",
        "n_tokens",
        "n_chars",
        share.alias("token_share_ppm"),
    )


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distribution drift between two corpus snapshots over a mixture
    key (source × language by default): per-group document counts and
    integer-ppm shares on each side, the signed share delta, and the
    group's contribution to total variation distance — the monitoring
    table a continuous-crawl pipeline alerts on (``sum(tv_ppm) / 2``
    ≈ TV distance in ppm). Groups present on one side only appear
    with a zero count on the other.

    Everything is integer arithmetic (the :func:`mix_report`
    DECIMAL(38)-DIV ppm rule on both sides), so the DuckDB twin is
    bit-exact. Numeric drift composes through the key: pass a binning
    expression as a column (e.g. ``F.floor(F.log2('n_chars'))`` — or
    any :func:`gram_bucket`-style hash bin) and the same report
    tracks histogram drift.

    Shape at scale: ONE partial-aggregatable groupBy per snapshot
    (map-side combine → one row per group per task), a full-outer
    join of two group-cardinality-sized aggregates (broadcast under
    AQE), and windows over the aggregated frames only — neither
    corpus is scanned twice."""
    cols = group_cols or ["source", "lang"]

    def counts(df: DataFrame) -> DataFrame:
        return df.groupBy(*[F.col(c) for c in cols]).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        )

    return drift_from_counts(counts(ref), counts(cur), cols)


def drift_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    group_cols: list[str],
    count_col: str = "n_docs",
) -> DataFrame:
    """:func:`drift_report` from PRE-AGGREGATED per-group counts
    (``group_cols…, count_col``) — the shared core the streaming
    drift sink feeds with its cumulative count ledger. Integer ppm
    arithmetic identical to :func:`mix_report`."""
    cols = list(group_cols)

    def side(per: DataFrame, tag: str) -> DataFrame:
        per = per.select(
            *[F.col(c).alias(f"__{tag}_{c}") for c in cols],
            F.col(count_col).alias(f"n_docs_{tag}"),
        )
        tot = F.sum(f"n_docs_{tag}").over(Window.partitionBy())
        share = F.expr(
            f"CAST((CAST(1000000 AS DECIMAL(38,0)) * n_docs_{tag})"
            f" DIV __tot AS BIGINT)"
        )
        return per.withColumn("__tot", tot).select(
            *[f"__{tag}_{c}" for c in cols],
            f"n_docs_{tag}",
            share.alias(f"share_ppm_{tag}"),
        )

    r, c2 = side(ref_counts, "ref"), side(cur_counts, "cur")
    # NULL-SAFE key equality: a NULL-keyed group ("lang unknown") is a
    # real monitoring bucket — a plain equi-join would never match it
    # to itself and report spurious full drift on both sides
    cond = None
    for c in cols:
        eq = r[f"__ref_{c}"].eqNullSafe(c2[f"__cur_{c}"])
        cond = eq if cond is None else (cond & eq)
    joined = r.join(c2, cond, "full_outer")
    a = F.coalesce("share_ppm_ref", F.lit(0))
    b = F.coalesce("share_ppm_cur", F.lit(0))
    return joined.select(
        *[
            F.coalesce(r[f"__ref_{c}"], c2[f"__cur_{c}"]).alias(c)
            for c in cols
        ],
        F.coalesce("n_docs_ref", F.lit(0)).alias("n_docs_ref"),
        F.coalesce("n_docs_cur", F.lit(0)).alias("n_docs_cur"),
        a.alias("share_ppm_ref"),
        b.alias("share_ppm_cur"),
        (b - a).alias("delta_ppm"),
        F.abs(b - a).alias("tv_ppm"),
    )


def select_top_n(
    df: DataFrame,
    n: int,
    by: str,
    id_col: str = "doc_id",
    ascending: bool = False,
) -> DataFrame:
    """Deterministic exact top-``n`` selection by a score column —
    the resampling tail of a DSIR/quality-scoring pipeline ("keep the
    N most target-like documents"). Ties on the score break by
    md5(id) then id, so the selected set is stable across runs,
    partitionings, and engines.

    Shape at scale: Catalyst compiles orderBy().limit(n) to
    TakeOrderedAndProject — each task keeps its own top-``n`` heap and
    the driver merges K·n rows, no global sort, no single-partition
    window (plan-asserted in tests). Driver memory is O(n); for
    selections where ``n`` itself is data-scale, use
    :func:`budget_sample` / :func:`temperature_sample` instead (their
    md5-strata running sums never materialize the selection on the
    driver)."""
    key = F.md5(F.col(id_col).cast("string"))
    score = F.col(by).asc() if ascending else F.col(by).desc()
    return df.orderBy(score, key.asc(), F.col(id_col).asc()).limit(n)


def fingerprint_index(
    ref: DataFrame,
    out_dir: str,
    index_name: str,
    text_col: str = "text",
    n_files: int = 8,
    spark=None,
):
    """Materialize a reference corpus for INDEXED cross-corpus dedup:
    rows are written with an md5 content ``fingerprint`` column
    (whitespace/case-normalized — the :func:`dedup_against` key) and
    registered under an engine index with a bloom on the fingerprint,
    so later batches locate only the FILES that might share content.

    Returns the :class:`~ariadne_spark.index.Index`. This is the
    corpus-ops twin of the window-store index composition in
    ``operators/dedup.py`` (store reads pruned by the engine's own
    file index)."""
    from ..index import Index
    from .layout import cluster_files

    spark = spark or ref.sparkSession
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    keyed = ref.withColumn("fingerprint", F.md5(norm))
    files = cluster_files(keyed, out_dir, "fingerprint", n_files=n_files)
    idx = Index.for_name(
        index_name, schema=keyed.schema, format="parquet", spark=spark
    )
    idx.add_bloom_index("fingerprint", fpr=0.01)
    idx.add_files(files)
    idx.update()
    return idx


def dedup_against_indexed(
    df: DataFrame,
    index,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`dedup_against` where the reference corpus sits behind a
    :func:`fingerprint_index`: the batch's distinct fingerprints
    drive the engine's bloom locate, so ONLY the reference files that
    might contain a batch fingerprint are read before the anti-join —
    at 100 TB the reference scan shrinks to the colliding files
    instead of the whole corpus. Result is row-identical to
    :func:`dedup_against` (blooms admit false positives, never false
    negatives — extra files only ever add rows the anti-join then
    rejects correctly)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    keyed = df.withColumn("__xk", F.md5(norm))
    keys = keyed.select(F.col("__xk").alias("fingerprint")).distinct()
    hits = (
        index.join(keys, on=["fingerprint"], how="inner")
        .select(F.col("fingerprint").alias("__xk"))
        .distinct()
    )
    return keyed.join(hits, "__xk", "left_anti").drop("__xk")
