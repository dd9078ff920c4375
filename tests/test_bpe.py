"""BPE learning/encoding vs an independent pure-Python reference:
the distributed pair-count argmax rounds must reproduce the exact
merge list, and the Arrow-batched encoder must agree with applying
the merges in rank order."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from ariadne_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    learn_bpe,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where("doc_id < 120")
        .select("doc_id", "text")
        .cache()
    )


def ref_learn(word_counts, num_merges, min_pair_count=2):
    vocab = {
        tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts.items()
    }
    merges = []
    for rank in range(num_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        merges.append((rank, l, r, c))
        newv = collections.Counter()
        for syms, cnt in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            newv[tuple(out)] += cnt
        vocab = dict(newv)
    return merges


def ref_encode(word, merges):
    """Apply merges greedily left-to-right IN RANK ORDER — an
    independent formulation of BPE application (the engine iterates
    lowest-rank-first; for a valid merge list they agree)."""
    syms = list(word) + [END_OF_WORD]
    for _, l, r, _ in merges:
        out = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        syms = out
    return syms


def _py_word_counts(docs):
    wc = collections.Counter()
    for row in docs.select("text").collect():
        wc.update((row["text"] or "").split())
    return dict(wc)


@pytest.mark.slow
def test_learn_matches_reference(spark, docs):
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe(docs, 20).orderBy("rank").collect()
    ]
    want = ref_learn(_py_word_counts(docs), 20)
    assert got == want and len(got) == 20


@pytest.mark.slow
def test_encode_matches_reference_and_roundtrips(spark, docs):
    merges_df = learn_bpe(docs, 20)
    merges = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    out = bpe_encode(docs, merges_df).collect()
    for row in out:
        text = row["text"] or ""
        want = []
        for w in text.split():
            want.extend(ref_encode(w, merges))
        assert row["bpe_tokens"] == want
        assert row["n_bpe_tokens"] == len(want)
        # lossless: concatenation reproduces the tokenized text
        joined = "".join(row["bpe_tokens"]).replace(END_OF_WORD, " ")
        assert joined.split() == text.split()


def test_learn_early_stop_and_validation(spark):
    d = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    # every adjacent pair occurs once -> below min_pair_count
    assert learn_bpe(d, 5).count() == 0
    with pytest.raises(ValueError):
        learn_bpe(d, 0)


def test_encode_handles_empty_and_unseen(spark, docs):
    merges = learn_bpe(docs, 5)
    d = spark.createDataFrame(
        [(1, ""), (2, None), (3, "zzzqqqxxx")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bpe_encode(d, merges).collect()}
    assert got[1]["bpe_tokens"] == [] and got[1]["n_bpe_tokens"] == 0
    assert got[2]["bpe_tokens"] == []
    # unseen word falls back to chars + marker
    assert got[3]["bpe_tokens"][-1] == END_OF_WORD
    assert "".join(got[3]["bpe_tokens"][:-1]) == "zzzqqqxxx"
