"""End-to-end crawl-ingest pipeline: the r07 URL/domain primitives
composed with the quality gate, near-dup arsenal, DSIR selection, and
the engine's file index.

Flow (the shape of a production web-crawl ingest at 100 TB):

  raw crawl (url, text)
    -> URL dedup               (normalized key, first wins)
    -> domain blocklist        (suffix-matched broadcast probe)
    -> per-domain quota        (anti-monoculture cap, eTLD+1)
    -> text normalization      (NFC + punctuation fold + whitespace)
    -> Gopher quality gate     (integer rules, scan speed)
    -> SimHash near-dup        (portable hash family, blocked pairs)
    -> DSIR selection          (importance vs an in-domain target)
    -> domain-indexed store    (computed index: domain predicates
                                prune FILES before any scan)

Run from the repo root:  python examples/crawl_pipeline.py
(uses /root/testdata/sf0.001; writes only under /tmp)
"""

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

WORK = "/tmp/ariadne_crawl_example"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("ariadne-crawl")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")
shutil.rmtree(WORK, ignore_errors=True)
spark.conf.set("spark.ariadne.storagePath", f"{WORK}/store")

# a fake crawl: the docs fixture with synthesized URLs (duplicates,
# case/fragment variants, a few domains)
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
crawl = docs.withColumn(
    "url",
    F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP://WWW.")).otherwise(
            F.lit("http://www.")
        ),
        F.col("source"), F.lit(".co.uk/item/"),
        (F.col("doc_id") % 40).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("#nav")).otherwise(F.lit("")),
    ),
)
print(f"crawl rows: {crawl.count()}")

# 1) URL-level dedup: one survivor per canonical URL ------------------
from ariadne_spark.operators.corpus import (
    domain_quota,
    importance_weights,
    registrable_domain_sql,
    select_top_n,
    url_dedup,
)

unique_urls = url_dedup(crawl, "url", "doc_id")
print(f"after url_dedup: {unique_urls.count()}")

# 1b) domain blocklist: drop known-bad sites (and their subdomains)
from ariadne_spark.operators.corpus import blocklist_filter

bad_sites = spark.createDataFrame([("src1.co.uk",), ("src7.co.uk",)], ["domain"])
allowed = blocklist_filter(unique_urls, bad_sites, "url", "doc_id")
print(f"after blocklist(2 domains): {allowed.count()}")

# 2) per-domain quota: no site dominates the corpus --------------------
quotad = domain_quota(allowed, "url", n_per_domain=5, id_col="doc_id")
print(f"after domain_quota(5): {quotad.count()}  "
      f"domains: {quotad.select('domain').distinct().count()}")

# 2b) canonicalize text BEFORE hashing/dedup so byte-different
# renderings of the same content collide downstream
from ariadne_spark.operators.text import normalize_text_columns

quotad = quotad.withColumns(
    {"text": normalize_text_columns("text")["text"]}
)

# 3) Gopher composite quality gate -------------------------------------
from ariadne_spark.operators.text import gopher_filter_columns

gate = gopher_filter_columns(
    "text", required_stopwords=["the", "a", "to", "of", "and", "that", "have", "with"]
)
kept = quotad.withColumns(dict(gate)).where(F.col("keep")).drop(
    "failed_rules", "keep"
)
print(f"after quality gate: {kept.count()}")

# 4) SimHash near-dup flagging (portable family) -----------------------
from ariadne_spark.operators.dedup import simhash_near_pairs, simhash_portable

pairs = simhash_near_pairs(
    simhash_portable(kept, "text", "doc_id"), "doc_id", max_hamming=3
)
dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
deduped = kept.join(dupes, "doc_id", "left_anti")
print(f"near-dup pairs: {pairs.count()}  after drop: {deduped.count()}")

# 5) DSIR selection toward an in-domain target --------------------------
target = deduped.where(F.col("lang") == "en")
scored = importance_weights(deduped, target, n=2)
selected = select_top_n(scored, 50, by="score")
print(f"selected top-50 target-like docs: {selected.count()}")

# 6) store the survivors under a DOMAIN computed index ------------------
from ariadne_spark import Index

final = deduped.join(selected.select("doc_id"), "doc_id", "leftsemi")
out_dir = f"{WORK}/corpus"
# cluster the store BY DOMAIN so the computed index prunes cleanly:
# partitionBy gives one directory per domain (domain_quota attached
# the column), and the index recomputes the domain from the url
# column inside each file
final.select("doc_id", "url", "text", "domain").write.partitionBy(
    "domain"
).mode("overwrite").parquet(out_dir)
files = sorted(glob.glob(f"{out_dir}/domain=*/*.parquet"))
schema = spark.read.parquet(files[0]).schema
idx = Index.for_name("crawl_corpus", schema=schema, format="parquet", spark=spark)
idx.add_computed_index("domain", registrable_domain_sql("url"))
idx.add_files(files).update()
some_domain = spark.read.parquet(out_dir).select(
    F.expr(registrable_domain_sql("url")).alias("d")
).first()["d"]
located = idx.locate_files({"domain": [some_domain]})
print(f"index: domain predicate '{some_domain}' prunes to "
      f"{len(located)}/{len(files)} files")

# 7) monitor: how far did cleaning+selection shift the source mix? --
from ariadne_spark.operators.corpus import drift_report

drift = drift_report(docs, final, ["lang"]).orderBy(F.desc("tv_ppm"))
tv = drift.agg((F.sum("tv_ppm") / 2).alias("tv")).first()["tv"]
print(f"lang-mix TV distance raw->selected: {tv/10000:.1f}% "
      f"(per-lang table has {drift.count()} rows)")
print("crawl pipeline complete")
spark.stop()
