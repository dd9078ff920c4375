"""Generate a dataset data card by composing the profiling operators:
one-pass table profile, mixture report, quality/lang distributions,
token statistics, and a drift check against a reference snapshot —
printed as markdown, the release artifact a corpus ships with.

Run from the repo root:  python examples/data_card.py
(uses /root/testdata/sf0.001; read-only)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("ariadne-datacard")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

from ariadne_spark.operators.corpus import drift_report, mix_report
from ariadne_spark.operators.profile import profile_table
from ariadne_spark.operators.text import (
    gopher_filter_columns,
    lang_id_columns,
    token_count,
)

print("# Data card: documents (sf0.001)\n")

# ---- size & schema profile (one pass over every column) -------------
prof = profile_table(docs).collect()
print("## Column profile\n")
print("| column | rows | nulls | distinct | min | max |")
print("|---|---|---|---|---|---|")
for r in prof:
    lo = r["min_num"] if r["min_num"] is not None else r["min_str"]
    hi = r["max_num"] if r["max_num"] is not None else r["max_str"]
    print(
        f"| {r['column']} | {r['n_rows']} | {r['n_nulls']} "
        f"| {r['n_distinct']} | {str(lo)[:24]} | {str(hi)[:24]} |"
    )

# ---- mixture: token share per (source, lang) ------------------------
print("\n## Mixture (top groups by token share)\n")
mix = mix_report(docs).orderBy(F.desc("token_share_ppm")).limit(8).collect()
print("| source | lang | docs | tokens | share ppm |")
print("|---|---|---|---|---|")
for r in mix:
    print(
        f"| {r['source']} | {r['lang']} | {r['n_docs']} "
        f"| {r['n_tokens']} | {r['token_share_ppm']} |"
    )

# ---- quality gate pass rate + token stats (single scan) -------------
gate = gopher_filter_columns(
    "text",
    required_stopwords=["the", "a", "to", "of", "and", "that", "have", "with"],
)
lang = lang_id_columns("text")
stats = docs.select(
    token_count("text").alias("n_tok"),
    gate["keep"].cast("int").alias("keep"),
    lang["lang_guess"].alias("lg"),
).agg(
    F.count(F.lit(1)).alias("docs"),
    F.sum("n_tok").alias("tokens"),
    F.expr("percentile(n_tok, array(0.5, 0.9, 0.99))").alias("tok_q"),
    F.avg("keep").alias("gopher_pass"),
).first()
print("\n## Text statistics\n")
print(f"- documents: {stats['docs']}, tokens: {stats['tokens']}")
q = stats["tok_q"]
print(f"- tokens/doc p50/p90/p99: {q[0]:.0f} / {q[1]:.0f} / {q[2]:.0f}")
print(f"- Gopher gate pass rate: {100 * stats['gopher_pass']:.1f}%")

# ---- drift vs a reference snapshot ----------------------------------
# stand-in for last release: %7 is coprime to the fixture's source
# grid (doc_id % 20), so the slice thins every group instead of
# deleting whole sources
ref = docs.where(F.col("doc_id") % 7 != 0)
drift = drift_report(ref, docs)
tv = drift.agg((F.sum("tv_ppm") / 2).alias("tv")).first()["tv"]
worst = drift.orderBy(F.desc("tv_ppm")).limit(3).collect()
print("\n## Drift vs reference snapshot\n")
print(f"- total-variation distance: {tv / 10000:.2f}%")
for r in worst:
    print(
        f"- {r['source']}/{r['lang']}: {r['share_ppm_ref']} -> "
        f"{r['share_ppm_cur']} ppm (delta {r['delta_ppm']:+})"
    )

print("\ndata card complete")
spark.stop()
