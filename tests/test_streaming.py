"""Streaming surface tests: index maintenance driven by streams,
file-path sinks, and watermarked exact dedup (SURVEY §2.9 extension;
the stateful latest-version operator is oracle-checked through the
driver gate and timed in bench)."""

from __future__ import annotations

import pytest

import uuid

from pyspark.sql import functions as F

from ariadne_spark import Index
from ariadne_spark.streaming.maintenance import (
    attach_index_maintenance,
    index_file_sink,
    streaming_exact_dedup,
)

from .conftest import rows_set


def test_attach_index_maintenance_converges(spark, storage, orders_files, tmp_path):
    """Each micro-batch globs for new files and updates the index; after
    one availableNow pass the index must answer queries over ALL files."""
    df, files = orders_files
    idx = Index.for_name("s_maint", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey")

    import os

    clock_dir = os.path.dirname(os.path.dirname(files[0]))
    stream = spark.readStream.schema(df.schema).parquet(f"{clock_dir}/part*")
    q = attach_index_maintenance(
        stream,
        "s_maint",
        path_glob=f"{clock_dir}/part*/*.parquet",
        checkpoint=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    idx2 = Index.for_name("s_maint", spark=spark)
    assert idx2.unindexed_files() == []
    keys = [r[0] for r in df.select("o_custkey").distinct().limit(5).collect()]
    got = idx2.read_matching({"o_custkey": keys}).select("o_orderkey", "o_custkey")
    want = df.where(F.col("o_custkey").isin(keys)).select("o_orderkey", "o_custkey")
    assert rows_set(got) == rows_set(want)


def test_index_file_sink_adds_streamed_paths(spark, storage, orders_files, tmp_path):
    """A stream of file-path rows registers exactly those files."""
    df, files = orders_files
    idx = Index.for_name("s_sink", schema=df.schema, format="parquet", spark=spark)
    idx.add_index("o_custkey")

    paths_df = spark.createDataFrame([(f,) for f in files[:2]], "path string")
    src = str(tmp_path / "paths")
    paths_df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("path string").parquet(src)
    q = index_file_sink(
        stream, "s_sink", checkpoint=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    idx2 = Index.for_name("s_sink", spark=spark)
    assert idx2._index_totals()[0] == 2


def test_streaming_exact_dedup_drops_in_window_duplicates(spark, tmp_path):
    """Duplicate (key, event-time) rows within the watermark emit once."""
    rows = [
        (1, "2024-01-01 10:00:00", "a"),
        (1, "2024-01-01 10:00:00", "a"),  # exact duplicate
        (2, "2024-01-01 10:05:00", "b"),
        (2, "2024-01-01 10:06:00", "b"),  # same key, new event time: kept
    ]
    df = (
        spark.createDataFrame(rows, "k int, ts_s string, v string")
        .select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    )
    src = str(tmp_path / "events")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    deduped = streaming_exact_dedup(stream, keys=["k"], event_time_col="ts")
    qname = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table(qname).collect()
    spark.catalog.dropTempView(qname)
    assert len(out) == 3
    assert sorted((r["k"], str(r["ts"])) for r in out) == [
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 10:05:00"),
        (2, "2024-01-01 10:06:00"),
    ]


def test_streaming_windowed_agg_matches_batch(spark, tmp_path):
    """availableNow windowed-agg backfill in complete mode equals the
    batch groupBy over the same data; late-data semantics are the
    watermark's job and need no wall clock here."""
    import datetime as dt

    from ariadne_spark.streaming.maintenance import streaming_windowed_agg

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 3), i % 24, 0, 0), f"t{i % 2}", float(i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["id", "ts", "kind", "value"])
    src = str(tmp_path / "events")
    df.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    agged = streaming_windowed_agg(
        stream,
        "ts",
        "1 day",
        keys=[F.col("kind")],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        ],
    )
    qname = f"swa_{uuid.uuid4().hex[:8]}"
    q = (
        agged.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = rows_set(
        spark.table(qname).select(
            F.col("window.start").alias("ws"), "kind", "n", "sv"
        )
    )
    want = rows_set(
        df.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("ws"),
            F.col("kind"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    assert got == want and len(got) == 6
    spark.catalog.dropTempView(qname)


@pytest.mark.slow
def test_attach_near_dup_maintenance_flags_cross_batch_dups(spark, tmp_path):
    """Streaming near-dup: duplicates arriving in a LATER micro-batch
    than their originals are flagged against the persisted store."""
    from pyspark.sql import types as T

    from ariadne_spark.streaming.maintenance import attach_near_dup_maintenance

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "stream_src")
    base = "the quick brown fox jumps over the lazy dog again and again"
    # batch files: doc 2 (file B) duplicates doc 0 (file A)
    spark.createDataFrame(
        [(0, base), (1, "completely different content here entirely")], schema
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/fa")
    spark.createDataFrame(
        [(2, base + " "), (3, "another unrelated document body text")], schema
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/fb")

    store = str(tmp_path / "store")
    flags = str(tmp_path / "flags")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = attach_near_dup_maintenance(
        stream, store, flags, trigger={"availableNow": True}
    )
    q.awaitTermination()
    pairs = {
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(flags).collect()
    }
    assert (0, 2) in pairs
    # store holds all four docs' signatures for the NEXT run
    assert spark.read.parquet(store).count() == 4


@pytest.mark.slow
def test_attach_near_dup_maintenance_with_signature_index(spark, tmp_path):
    """r09: the near-dup sink with ``signature_index_name`` maintains a
    band-key bloom file-index over the signature store and must flag
    exactly the same pairs as the unindexed sink (pruning is an
    optimization, never semantics)."""
    from pyspark.sql import types as T

    from ariadne_spark import catalog as _cat
    from ariadne_spark.streaming.maintenance import attach_near_dup_maintenance

    spark.conf.set(
        "spark.ariadne.storagePath", str(tmp_path / "ariadne_store")
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "stream_src")
    base = "the quick brown fox jumps over the lazy dog again and again"
    spark.createDataFrame(
        [(0, base), (1, "completely different content here entirely")], schema
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/fa")
    spark.createDataFrame(
        [(2, base + " "), (3, "another unrelated document body text")], schema
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/fb")

    store = str(tmp_path / "store")
    flags = str(tmp_path / "flags")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    try:
        q = attach_near_dup_maintenance(
            stream, store, flags, trigger={"availableNow": True},
            signature_index_name="neardup_sig_idx_test",
        )
        q.awaitTermination()
    finally:
        try:
            _cat.remove("neardup_sig_idx_test", spark)
        except Exception:
            pass
    pairs = {
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(flags).collect()
    }
    assert (0, 2) in pairs
    assert spark.read.parquet(store).count() == 4


def test_attach_substring_dedup_maintenance_cleans_cross_batch(spark, tmp_path):
    """Streaming substring dedup: a k-token span repeated in a LATER
    micro-batch is cut there against the persisted window history,
    while its first sighting stayed clean."""
    from pyspark.sql import types as T

    from ariadne_spark.streaming.maintenance import (
        attach_substring_dedup_maintenance,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "stream_src")
    span = "w1 w2 w3 w4"
    spark.createDataFrame(
        [(0, span + " tailA"), (1, "fully distinct content one")], schema
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/fa")
    spark.createDataFrame(
        [(2, span + " tailB"), (3, "fully distinct content two")], schema
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/fb")

    store = str(tmp_path / "winstore")
    out = str(tmp_path / "cleaned")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = attach_substring_dedup_maintenance(
        stream, store, out, k=4, trigger={"availableNow": True}
    )
    q.awaitTermination()
    got = {
        r["doc_id"]: (r["n_dup_tokens"], r["cleaned_text"])
        for r in spark.read.parquet(out).collect()
    }
    assert got[0] == (0, span + " tailA")  # first sighting: clean
    assert got[2] == (4, "tailB")  # later batch: span cut vs history
    assert got[1][0] == 0 and got[3][0] == 0
    # window counts persisted for the NEXT run: the shared window has
    # total count 2 across batches
    wk = spark.read.parquet(store).groupBy("__wk").sum("count")
    assert wk.where("`sum(count)` = 2").count() == 1


def test_streaming_latest_version_restart_recovers_state(spark, tmp_path):
    """Stateful latest-per-key survives a stop/restart on the SAME
    checkpoint: batch 2 events older than batch 1's winners must lose
    against RESTORED state, and newer ones must win — equivalent to
    the batch window dedup over the full history."""
    from ariadne_spark.streaming.maintenance import streaming_latest_version

    schema = "k int, ts timestamp, v string"
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).parquet(src)
        latest = streaming_latest_version(stream, "k", "ts")
        # memory sink cannot recover from a checkpoint; foreachBatch can
        q = (
            latest.writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [
        (1, "2024-01-05 00:00:00", "one-new"),
        (2, "2024-01-03 00:00:00", "two-old"),
    ]
    (
        spark.createDataFrame(b1, "k int, ts_s string, v string")
        .select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )
    run_once()  # first query consumes batch 1 and terminates

    b2 = [
        (1, "2024-01-01 00:00:00", "one-stale"),   # OLDER: must lose
        (2, "2024-01-09 00:00:00", "two-newer"),   # newer: must win
        (3, "2024-01-02 00:00:00", "three-first"),
    ]
    (
        spark.createDataFrame(b2, "k int, ts_s string, v string")
        .select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )
    run_once()  # RESTART from the same checkpoint

    # compact the update-mode emissions: last emission per key
    out = spark.read.parquet(out_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(F.col("ts").desc())
    final = {
        (r["k"], r["v"])
        for r in out.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    }
    assert final == {(1, "one-new"), (2, "two-newer"), (3, "three-first")}, (
        "restored state must beat stale batch-2 events and lose to newer ones"
    )


def test_attach_quality_gate_splits_keeps_and_rejects(spark, tmp_path):
    """Streaming Gopher gate: keepers and rejects (with the
    violated-rule audit trail) land in their respective sinks; batch
    results equal the batch operator on the same rows."""
    from pyspark.sql import types as T

    from ariadne_spark.operators.text import gopher_filter
    from ariadne_spark.streaming.maintenance import attach_quality_gate

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    rows_a = [
        (0, "the quick brown fox jumps over that lazy dog with glee today"),
        (1, "too few"),
    ]
    rows_b = [
        (2, "the spam spam spam spam spam of spam spam that spam with spam"),
        (3, "the little dog ran to the big park and sat with joy there"),
    ]
    src = str(tmp_path / "qg_src")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/fa")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/fb")

    out = str(tmp_path / "qg_keep")
    rej = str(tmp_path / "qg_rej")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = attach_quality_gate(
        stream, out, rejects_path=rej, trigger={"availableNow": True}
    )
    q.awaitTermination()

    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    rejects = {
        r["doc_id"]: set(r["failed_rules"])
        for r in spark.read.parquet(rej).collect()
    }
    batch = spark.createDataFrame(rows_a + rows_b, schema)
    want = {r["doc_id"]: r for r in gopher_filter(batch).collect()}
    assert kept == {d for d, r in want.items() if r["keep"]}
    assert set(rejects) == {d for d, r in want.items() if not r["keep"]}
    for d, rules in rejects.items():
        assert rules == set(want[d]["failed_rules"])
    # keeper sink drops the audit columns, keeps batch_id lineage
    cols = set(spark.read.parquet(out).columns)
    assert "failed_rules" not in cols and "batch_id" in cols


@pytest.mark.slow
def test_attach_url_dedup_first_wins_and_ledger_persists(spark, tmp_path):
    """Streaming URL dedup: within a batch the smallest id per
    normalized key survives; keys already in the ledger are
    suppressed in LATER batches; null-URL rows always pass. A second
    stream over new files with previously-seen keys emits nothing
    new — the ledger is the state."""
    from pyspark.sql import types as T

    from ariadne_spark.streaming.maintenance import (
        attach_url_dedup_maintenance,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
        ]
    )
    rows_a = [
        (5, "HTTP://A.com/x/"),
        (2, "http://a.com/x#frag"),   # same key as 5 -> 2 survives
        (7, "http://b.com/y"),
        (9, None),                    # null passes through
    ]
    rows_b = [
        (1, "http://a.com/x"),        # key seen in batch A -> dropped
        (3, "http://c.com/z"),
        (4, None),                    # null passes through again
    ]
    src = str(tmp_path / "ud_src")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/fa")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/fb")

    out = str(tmp_path / "ud_out")
    store = str(tmp_path / "ud_store")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = attach_url_dedup_maintenance(
        stream, store, out, trigger={"availableNow": True}
    )
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {2, 7, 9, 3, 4}

    # a fresh stream of ONLY seen keys emits nothing but nulls
    rows_c = [(11, "http://b.com/y/"), (12, None)]
    src2 = str(tmp_path / "ud_src2")
    spark.createDataFrame(rows_c, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src2}/fc")
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src2}/f*")
    )
    out2 = str(tmp_path / "ud_out2")
    q2 = attach_url_dedup_maintenance(
        stream2, store, out2, trigger={"availableNow": True}
    )
    q2.awaitTermination()
    got2 = {r["doc_id"] for r in spark.read.parquet(out2).collect()}
    assert got2 == {12}


@pytest.mark.slow
def test_attach_url_dedup_ledger_index_prunes_and_matches(
    spark, storage, tmp_path
):
    """engine x pipeline: with ledger_index_name set, the sink
    maintains a bloom file-index over the seen-key ledger and each
    batch anti-joins only the files that may contain its keys. The
    survivor set must EQUAL the unindexed sink's (pruning is an
    optimization, never a semantics change), and a probe for one
    batch's key space must positively exclude the other batch's
    ledger file."""
    from pyspark.sql import types as T

    from ariadne_spark.operators.dedup import (
        _prune_snapshot_with_index,
        _snapshot_files,
    )
    from ariadne_spark.streaming.maintenance import (
        attach_url_dedup_maintenance,
        url_ledger_index,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
        ]
    )
    # batch A: alpha keys (one dup); batch B: beta keys + one URL
    # already seen in batch A (must be dropped via the pruned read)
    rows_a = [(1, "http://alpha.com/1"), (2, "http://ALPHA.com/1"),
              (3, "http://alpha.com/3")]
    rows_b = [(4, "http://beta.com/4"), (5, "http://alpha.com/1"),
              (6, "http://beta.com/6")]
    src = str(tmp_path / "ui_src")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(f"{src}/fa")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(f"{src}/fb")

    out = str(tmp_path / "ui_out")
    store = str(tmp_path / "ui_store")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = attach_url_dedup_maintenance(
        stream, store, out,
        trigger={"availableNow": True},
        ledger_index_name="url_ledger_test",
    )
    q.awaitTermination()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # 1 wins alpha/1 (smallest id), 3 and the two beta keys survive;
    # 2 (in-batch dup) and 5 (cross-batch dup, via the pruned read) drop
    assert got == [1, 3, 4, 6]
    # the bloom index positively excludes the other batch's ledger
    # file for a key that lives only in batch A's ledger file
    idx = url_ledger_index(spark, store, "url_ledger_test")
    files = _snapshot_files(spark, store, "url ledger")
    assert len(files) >= 2
    keys_a = spark.createDataFrame(
        [("http://alpha.com/3",)], "url_key string"
    )
    pruned = _prune_snapshot_with_index(
        spark, files, idx, keys_a, column="url_key"
    )
    assert len(pruned) < len(files)

    # r10: compact the ledger (distinct url_key, crash-safe swap),
    # refresh the index — the replaced files must drop out of the
    # index and the anti-join semantics must be unchanged
    from ariadne_spark.streaming.maintenance import url_ledger_compact

    before = {r["url_key"] for r in spark.read.parquet(store).collect()}
    kept = url_ledger_compact(spark, store, rows_per_file=2)
    after = {r["url_key"] for r in spark.read.parquet(store).collect()}
    assert after == before and kept == len(after)
    idx2 = url_ledger_index(spark, store, "url_ledger_test")
    files2 = _snapshot_files(spark, store, "url ledger")
    assert set(idx2.filelist.filenames()) == set(files2)
    seen = spark.read.parquet(*files2)
    probe = spark.createDataFrame(
        [("http://alpha.com/1",), ("http://nowhere.com/9",)],
        "url_key string",
    )
    survivors = {
        r["url_key"]
        for r in probe.join(seen, "url_key", "left_anti").collect()
    }
    assert survivors == {"http://nowhere.com/9"}


@pytest.mark.slow
def test_attach_domain_quota_depletes_across_batches(spark, tmp_path):
    """Cross-batch budget: a domain spanning micro-batches consumes
    its quota cumulatively (batch A takes 2 of 3, batch B gets only
    1 more); within a batch the md5-smallest ids win; null-domain
    rows drop."""
    from pyspark.sql import types as T

    from ariadne_spark.streaming.maintenance import (
        attach_domain_quota_maintenance,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
        ]
    )
    rows_a = [
        (1, "http://a.com/1"),
        (2, "http://a.com/2"),
        (3, "not a url"),
    ]
    rows_b = [
        (4, "http://a.com/4"),
        (5, "http://a.com/5"),
        (6, "http://b.com/6"),
    ]
    src = str(tmp_path / "dq_src")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/fa")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/fb")

    out = str(tmp_path / "dq_out")
    store = str(tmp_path / "dq_store")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = attach_domain_quota_maintenance(
        stream, store, out, n_per_domain=3, trigger={"availableNow": True}
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    per = {
        r["domain"]: r["c"]
        for r in got.groupBy("domain").agg(F.count("*").alias("c")).collect()
    }
    # a.com: 2 from batch A + 1 from batch B = quota 3; b.com: 1
    assert per == {"a.com": 3, "b.com": 1}
    ids_a = sorted(
        r["doc_id"] for r in got.where(F.col("domain") == "a.com").collect()
    )
    assert 1 in ids_a and 2 in ids_a and len(ids_a) == 3
    assert 3 not in {r["doc_id"] for r in got.collect()}
    # the store records cumulative usage + the committing batch id
    from ariadne_spark.storage.table import ParquetTable

    store_t = ParquetTable(spark, store)
    used = {
        r["domain"]: (r["used"], r["last_batch"])
        for r in store_t.read().collect()
    }
    assert used == {"a.com": (3, 1), "b.com": (1, 1)}
    # REPLAY idempotency: re-running the whole stream sees batch ids
    # <= the ledger's last_batch, so every batch is skipped entirely —
    # used is NOT double-counted (which would permanently under-admit
    # a.com) and no duplicate survivors append (crash-after-ledger
    # recovery path)
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q2 = attach_domain_quota_maintenance(
        stream2, store, out, n_per_domain=3, trigger={"availableNow": True}
    )
    q2.awaitTermination()
    used2 = {
        r["domain"]: (r["used"], r["last_batch"])
        for r in store_t.read().collect()
    }
    assert used2 == used
    assert spark.read.parquet(out).count() == 4


@pytest.mark.slow
def test_quota_sink_imports_pre_manifest_budget_store(spark, tmp_path):
    """Upgrade path: an r07-format (plain parquet, no manifest)
    (domain, used) store must be IMPORTED into the first ParquetTable
    commit, not silently dropped — a domain with exhausted budget
    stays exhausted across the upgrade."""
    from pyspark.sql import types as T

    from ariadne_spark.storage.table import ParquetTable
    from ariadne_spark.streaming.maintenance import (
        attach_domain_quota_maintenance,
    )

    store = str(tmp_path / "mig_store")
    # old-format ledger: a.com already used 3 of 3
    spark.createDataFrame(
        [("a.com", 3)], "domain string, used bigint"
    ).coalesce(1).write.parquet(store)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
        ]
    )
    src = str(tmp_path / "mig_src")
    spark.createDataFrame(
        [(10, "http://a.com/x"), (11, "http://b.com/y")], schema
    ).coalesce(1).write.parquet(f"{src}/fa")
    out = str(tmp_path / "mig_out")
    stream = spark.readStream.schema(schema).parquet(f"{src}/f*")
    q = attach_domain_quota_maintenance(
        stream, store, out, n_per_domain=3, trigger={"availableNow": True}
    )
    q.awaitTermination()
    # a.com exhausted pre-upgrade: only b.com admitted
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [11]
    used = {
        r["domain"]: r["used"]
        for r in ParquetTable(spark, store).read().collect()
    }
    assert used == {"a.com": 3, "b.com": 1}


def test_quota_sink_survivors_use_window_group_limit(spark):
    """The sink's per-batch survivor plan must pre-top map-side like
    the batch operator: the literal __rk <= n bound (a correct
    superset of the budget predicate since used >= 0) has to compile
    to WindowGroupLimit so a hot domain never sorts its whole batch
    partition in one task."""
    from ariadne_spark.streaming.maintenance import _quota_batch_survivors

    domained = spark.createDataFrame(
        [(i, "a.com" if i < 40 else "b.com") for i in range(50)],
        ["doc_id", "domain"],
    )
    used = spark.createDataFrame([("a.com", 2)], "domain string, used bigint")
    kept = _quota_batch_survivors(domained, used, 3, "doc_id")
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    per = {
        r["domain"]: r["c"]
        for r in kept.groupBy("domain").agg(F.count("*").alias("c")).collect()
    }
    # a.com has 2 of 3 spent -> 1 admitted; b.com fresh -> 3
    assert per == {"a.com": 1, "b.com": 3}


def test_attach_drift_maintenance_accumulates_to_batch_answer(spark, tmp_path):
    """Counts are additive: after the stream drains, the sink's drift
    table must EQUAL the batch drift_report over the whole stream —
    regardless of how rows were split into micro-batches. The ledger
    holds one row per key and survives across batches."""
    from pyspark.sql import types as T

    from ariadne_spark.operators.corpus import drift_report
    from ariadne_spark.streaming.maintenance import attach_drift_maintenance

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    rows_a = [(1, "a", "en"), (2, "a", "en"), (3, "b", "en")]
    rows_b = [(4, "a", "en"), (5, "c", "fr"), (6, "c", "fr")]
    src = str(tmp_path / "dr_src")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(f"{src}/fa")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(f"{src}/fb")

    # reference histogram: 2 'a', 2 'b' docs
    ref_rows = [(10, "a", "en"), (11, "a", "en"), (12, "b", "en"), (13, "b", "en")]
    ref_df = spark.createDataFrame(ref_rows, schema)
    ref_path = str(tmp_path / "dr_ref")
    ref_df.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).coalesce(1).write.parquet(ref_path)

    out = str(tmp_path / "dr_out")
    store = str(tmp_path / "dr_store")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = attach_drift_maintenance(
        stream, ref_path, store, out, trigger={"availableNow": True}
    )
    q.awaitTermination()

    from ariadne_spark.storage.table import ParquetTable

    out_t = ParquetTable(spark, out)
    got = rows_set(out_t.read())
    all_rows = spark.createDataFrame(rows_a + rows_b, schema)
    want = rows_set(drift_report(ref_df, all_rows))
    assert got == want
    # ledger: one row per key with the cumulative counts + the batch
    # id that committed them (the replay guard)
    ledger_t = ParquetTable(spark, store)
    ledger = {
        (r["source"], r["lang"]): (r["n_docs"], r["last_batch"])
        for r in ledger_t.read().collect()
    }
    assert ledger == {
        ("a", "en"): (3, 1),
        ("b", "en"): (1, 1),
        ("c", "fr"): (2, 1),
    }
    # hand-check one cell: 'c' absent from ref -> full current share
    byk = {(r["source"], r["lang"]): r for r in out_t.read().collect()}
    assert byk[("c", "fr")]["n_docs_ref"] == 0
    assert byk[("c", "fr")]["share_ppm_cur"] == 333333
    # REPLAY idempotency: re-running the whole stream against the
    # same ledger replays batches 0 and 1 with ids <= last_batch, so
    # the additive folds are SKIPPED — counts and drift unchanged
    # (this is the crash-after-ledger-commit recovery path)
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q2 = attach_drift_maintenance(
        stream2, ref_path, store, out, trigger={"availableNow": True}
    )
    q2.awaitTermination()
    ledger2 = {
        (r["source"], r["lang"]): (r["n_docs"], r["last_batch"])
        for r in ledger_t.read().collect()
    }
    assert ledger2 == ledger
    assert rows_set(out_t.read()) == want


@pytest.mark.slow
def test_attach_drift_maintenance_checkpoint_restart_continues(spark, tmp_path):
    """With a STABLE checkpoint_location, a restarted stream resumes
    at the next batch id (monotone across restarts): already-committed
    files are not re-read, genuinely new files fold in, and the final
    counts equal the batch answer — the documented contract the replay
    guard depends on."""
    from pyspark.sql import types as T

    from ariadne_spark.storage.table import ParquetTable
    from ariadne_spark.streaming.maintenance import attach_drift_maintenance

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    rows_a = [(1, "a", "en"), (2, "a", "en")]
    rows_b = [(3, "b", "fr")]
    src = str(tmp_path / "ck_src")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(f"{src}/fa")
    ref_path = str(tmp_path / "ck_ref")
    spark.createDataFrame(rows_a, schema).groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).coalesce(1).write.parquet(ref_path)
    out = str(tmp_path / "ck_out")
    store = str(tmp_path / "ck_store")
    ckpt = str(tmp_path / "ck_ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*")
        )
        q = attach_drift_maintenance(
            stream, ref_path, store, out,
            trigger={"availableNow": True},
            checkpoint_location=ckpt,
        )
        q.awaitTermination()

    run()
    ledger_t = ParquetTable(spark, store)
    assert ledger_t.manifest_extra()["last_batch"] == 0
    # a new file lands; the restarted query (same checkpoint) must
    # process ONLY it, as batch 1 — not renumber from 0 and get
    # swallowed by the replay guard
    spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(f"{src}/fb")
    run()
    assert ledger_t.manifest_extra()["last_batch"] == 1
    counts = {
        (r["source"], r["lang"]): r["n_docs"]
        for r in ledger_t.read().collect()
    }
    assert counts == {("a", "en"): 2, ("b", "fr"): 1}


def test_attach_drift_maintenance_null_keyed_group_folds_once(spark, tmp_path):
    """A NULL-keyed group (lang unknown) spanning micro-batches must
    fold into ONE cumulative ledger row — the fold join is null-safe
    like drift_from_counts' own join, so the ledger never grows a
    duplicate row per batch and the drift table matches the batch
    answer (mirrors test_drift_report_null_keyed_group_matches_itself
    for the streaming sink)."""
    from pyspark.sql import types as T

    from ariadne_spark.operators.corpus import drift_report
    from ariadne_spark.storage.table import ParquetTable
    from ariadne_spark.streaming.maintenance import attach_drift_maintenance

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    rows_a = [(1, "a", None), (2, "a", "en"), (3, "b", None)]
    rows_b = [(4, "a", None), (5, "a", None), (6, "b", "en")]
    src = str(tmp_path / "dn_src")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(f"{src}/fa")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(f"{src}/fb")
    ref_rows = [(10, "a", None), (11, "a", "en")]
    ref_df = spark.createDataFrame(ref_rows, schema)
    ref_path = str(tmp_path / "dn_ref")
    ref_df.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).coalesce(1).write.parquet(ref_path)

    out = str(tmp_path / "dn_out")
    store = str(tmp_path / "dn_store")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = attach_drift_maintenance(
        stream, ref_path, store, out, trigger={"availableNow": True}
    )
    q.awaitTermination()
    ledger = {
        (r["source"], r["lang"]): r["n_docs"]
        for r in ParquetTable(spark, store).read().collect()
    }
    # ("a", NULL) appears in BOTH batches: one row, count 3 — a
    # non-null-safe fold would leave two rows for it
    assert ledger == {
        ("a", None): 3,
        ("a", "en"): 1,
        ("b", None): 1,
        ("b", "en"): 1,
    }
    got = rows_set(ParquetTable(spark, out).read())
    want = rows_set(
        drift_report(ref_df, spark.createDataFrame(rows_a + rows_b, schema))
    )
    assert got == want
