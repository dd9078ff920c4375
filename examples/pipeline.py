"""Training-data pipeline tour: the beyond-reference operators.

Run from the repo root:  python examples/pipeline.py
(uses /root/testdata/sf0.001; writes only under /tmp)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

WORK = "/tmp/ariadne_pipeline_example"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("ariadne-pipeline")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")
shutil.rmtree(WORK, ignore_errors=True)

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

# 1) single-scan cleaning pass: quality + language columns, filter ----
from ariadne_spark.operators.text import (
    lang_id_columns,
    quality_feature_columns,
)

qf, li = quality_feature_columns("text"), lang_id_columns("text")
cleaned = (
    docs.withColumns(
        {
            "n_words": qf["n_words"],
            "stopword_ratio": qf["stopword_ratio"],
            "lang_guess": li["lang_guess"],
        }
    )
    .where((F.col("n_words") >= 10) & (F.col("lang_guess") != "und"))
)
print("1) cleaned docs:", cleaned.count(), "of", docs.count())

# 2) dedup: exact, then MinHash+LSH near-dups -------------------------
from ariadne_spark.operators.dedup import (
    exact_dedup_normalized,
    near_dup_minhash,
)

deduped = exact_dedup_normalized(cleaned, "text", "doc_id")
pairs = near_dup_minhash(docs, "text", "doc_id", threshold=0.8)
print("2) exact-deduped:", deduped.count(), "; near-dup pairs:", pairs.count())

# 3) similarity search over embeddings --------------------------------
from ariadne_spark.operators.similarity import cosine_topk

queries = emb.where(F.col("vec_id") < 2).select(
    F.col("vec_id").alias("query_id"), "embedding"
)
topk = cosine_topk(emb, queries, k=5)
print("3) cosine top-5:", topk.count(), "result rows")

# 4) multimodal: pack fake media, extract features, sample frames -----
from ariadne_spark.operators.multimodal import (
    decode_media,
    frame_sample_stub,
    pack_fake_media,
)

packed = pack_fake_media(docs.limit(50), "text", media_type="video")
feats = decode_media(packed, "media", codec="fake", batch_cols=["doc_id"])
frames = frame_sample_stub(
    packed.withColumn(
        "media_meta",
        F.col("media_meta").withField(
            "duration_ms", (F.col("n_chars") * 10).cast("long")
        ),
    ),
    every_ms=500,
)
print("4) media features:", feats.count(), "; planned frames:", frames.count())

# 5) scale utilities: layout clustering + skew-safe join --------------
from ariadne_spark.operators.layout import cluster_files
from ariadne_spark.operators.util import salted_join

orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
files = cluster_files(orders, f"{WORK}/orders_clustered", "o_orderkey", n_files=4)
hot = salted_join(
    orders.select("o_orderkey", "o_custkey"),
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    ),
    on=["o_custkey"],
    salt=8,
)
print("5) clustered files:", len(files), "; salted join rows:", hot.count())

# 6) persisted IVF: ANN composed with the engine's file pruning -------
from ariadne_spark.operators.similarity import ivf_index_build, ivf_index_topk

spark.conf.set("spark.ariadne.storagePath", f"{WORK}/store")
ividx, cents = ivf_index_build(
    emb, f"{WORK}/ivf", "example_ivf", n_centroids=16, n_files=8
)
ann = ivf_index_topk(ividx, cents, queries, k=5, n_probe=2)
probed_files = len(ividx._last_locate_stats.sizes)
print("6) ivf-indexed top-5:", ann.count(), "rows; files probed:",
      probed_files, "of", ividx._index_totals()[0])

# 7) corpus management: split / quota / PII / contamination ----------
from ariadne_spark.operators.corpus import (
    contamination_check,
    deterministic_split,
    pii_redact,
    quota_sample,
)

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
split = deterministic_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
mix = quota_sample(docs, "source", 3)
scrubbed = pii_redact(
    docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" reach me at a@b.io"))
    )
)
contam = contamination_check(
    docs.where("doc_id >= 10"), docs.where("doc_id < 10"), n=5
)
print(
    "7) splits:",
    {r["split"]: r["count"] for r in split.groupBy("split").count().collect()},
    "; quota rows:", mix.count(),
    "; redactions:", scrubbed.agg(F.sum("n_redactions")).collect()[0][0],
    "; contaminated docs:", contam.count(),
)

# 8) boilerplate line dedup + vocabulary + one-pass profiling ---------
from ariadne_spark.operators.corpus import line_dedup, vocab_stats
from ariadne_spark.operators.profile import numeric_quantiles, profile_table

ml = docs.withColumn(
    "text", F.regexp_replace("text", r"((?:\S+ ){7}\S+) ", "$1\n")
)
kept = line_dedup(ml, "text", "doc_id")
vocab = vocab_stats(docs).orderBy(F.desc("df")).limit(5)
prof = profile_table(docs)           # HLL sketches: one scan, any width
quant = numeric_quantiles(docs)      # t-digest sketches, same shape
print(
    "8) line-deduped docs:", kept.count(),
    "; top terms:", [r["term"] for r in vocab.collect()],
    "; profiled columns:", prof.count(), "+", quant.count(), "quantile rows",
)

# 9) incremental near-dup: a new crawl batch vs the persisted store ---
from ariadne_spark.operators.dedup import (
    incremental_near_dup,
    minhash_signatures_fast,
    signature_store_write,
)

store = "/tmp/ariadne_pipeline_sigstore"
hist = docs.where("doc_id < 250")
batch = docs.where("doc_id >= 250")
signature_store_write(
    minhash_signatures_fast(hist, "text", "doc_id"), store, mode="overwrite"
)
inc = incremental_near_dup(batch, store, threshold=0.8, update_store=False)
print("9) incremental near-dup pairs (batch vs history):", inc.count())

# 9b) same, behind the engine's band-key file index: the batch reads
#     only signature-store files whose bloom may contain one of its
#     LSH band keys (identical pairs; at crawl scale a novel batch
#     reads ~zero history files instead of scanning the store)
from ariadne_spark.operators.dedup import signature_store_index

sidx = signature_store_index(spark, store, "pipeline_sig_idx")
inc_idx = incremental_near_dup(
    batch, store, threshold=0.8, update_store=False, store_index=sidx
)
print("9b) same pairs via band-key file index:", inc_idx.count())

# 10) incremental substring dedup: clean the same batch against the
#     window-count history of everything already ingested ------------
from ariadne_spark.operators.dedup import incremental_substring_dedup

wstore = "/tmp/ariadne_pipeline_winstore"
shutil.rmtree(wstore, ignore_errors=True)
incremental_substring_dedup(hist, wstore, k=8)
cleaned_batch = incremental_substring_dedup(
    batch, wstore, k=8, update_store=False
)
cut = cleaned_batch.where("n_dup_tokens > 0").count()
print("10) substring-cleaned batch docs with cut spans:", cut)

# 11) leakage-safe splits + mixture sampling ---------------------------
from ariadne_spark.operators.corpus import (
    cluster_safe_split,
    temperature_sample,
)

splits = cluster_safe_split(
    docs, pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
    {"train": 0.8, "val": 0.1, "test": 0.1},
)
mix = temperature_sample(docs, "source", budget=100, alpha=0.5)
print(
    "11) cluster-safe split sizes:",
    {r["split"]: r["count"] for r in splits.groupBy("split").count().collect()},
    "; temperature mix:", mix.count(), "docs",
)

# 12) BPE: learn a vocabulary, encode the corpus -----------------------
from ariadne_spark.operators.bpe import bpe_encode, learn_bpe

merges = learn_bpe(docs, 15)
enc = bpe_encode(docs, merges)
print(
    "12) bpe merges:",
    [(r["left"], r["right"]) for r in merges.orderBy("rank").limit(5).collect()],
    "... ; encoded tokens:",
    enc.agg(F.sum("n_bpe_tokens")).collect()[0][0],
)

# 13) multimodal dedup: perceptual image + acoustic audio -------------
from ariadne_spark.operators.multimodal import (
    audio_near_dup,
    image_near_dup,
    pack_synthetic_ppm,
    pack_synthetic_wav,
)

imgs = pack_synthetic_ppm(docs.select("doc_id"), "doc_id")
img_pairs = image_near_dup(imgs, "media", "doc_id", codec="ppm")
wavs = pack_synthetic_wav(docs.select("doc_id").limit(100), "doc_id")
wav_pairs = audio_near_dup(wavs, "media", "doc_id")
print(
    "13) image near-dup pairs:", img_pairs.count(),
    "; audio near-dup pairs:", wav_pairs.count(),
)

# 13b) quality gate + mixture audit (round 6) -------------------------
from ariadne_spark.operators.text import gopher_filter
from ariadne_spark.operators.corpus import mix_report

gate = gopher_filter(
    docs, required_stopwords=["the", "a", "to", "of", "and", "that", "have", "with"]
)
kept = gate.where("keep").count()
mix = mix_report(docs)
print(
    "13b) gopher gate keeps:", kept, "/", docs.count(),
    "; mixture groups:", mix.count(),
)

# 13c) embedding suite: kNN auto-label + PQ ANN (round 6) --------------
from ariadne_spark.operators.quantization import (
    pq_ann_topk_rerank,
    pq_encode,
    pq_train,
)
from ariadne_spark.operators.similarity import knn_classify

emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
ref = emb.where(F.col("vec_id") % 11 != 0)
held = emb.where(F.col("vec_id") % 11 == 0).select(
    F.col("vec_id").alias("query_id"), "embedding"
)
labels = knn_classify(ref, held, k=15)
books = pq_train(emb, m=8, k=16, iters=2)
codes = pq_encode(emb, books)
ann = pq_ann_topk_rerank(
    codes, emb, held.limit(3), books, k=5, shortlist=100
)
print(
    "13c) kNN-labeled:", labels.count(),
    "; PQ ANN rows:", ann.count(),
    "(codes are", books.shape[0], "bytes/vector vs",
    64 * 8, "raw)",
)

# 13d) engine x corpus composition: indexed cross-corpus dedup --------
from ariadne_spark.operators.corpus import (
    dedup_against_indexed,
    fingerprint_index,
)

spark.conf.set("spark.ariadne.minBloomPruneBytes", "0")  # toy-size store
fp_idx = fingerprint_index(
    docs.where(F.col("source") == "src0"),
    "/tmp/ariadne_pipeline_fpidx",
    "pipeline_src0_fp",
    n_files=8,
)
survivors = dedup_against_indexed(docs.where(F.col("source") != "src0"), fp_idx)
print(
    "13d) indexed cross-corpus dedup keeps:", survivors.count(),
    "of", docs.where(F.col("source") != "src0").count(),
    "(reference read pruned to bloom-colliding files)",
)

# 14) engine extras: the workload advisor -----------------------------
import ariadne_spark

adv = ariadne_spark.advise_indexes(
    ["SELECT * FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 200",
     "SELECT * FROM orders WHERE o_custkey IN (1, 2, 3)"],
    spark,
    tables={"orders": orders},
)
print("14) advisor:", [(r["column"], r["suggested"]) for r in adv.collect()])

spark.stop()
