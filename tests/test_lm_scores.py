"""ngram_lm_scores: add-k bigram LM perplexity (the CCNet-style
quality signal, trained distributed). Checked against an independent
pure-Python LM on the real corpus (1e-9 tolerance — float log2 sums),
an exact tiny-corpus oracle, and the semantic direction (text made of
corpus-frequent bigrams scores lower perplexity than unseen-vocab
text)."""

from __future__ import annotations

import math
import re

import pytest

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.operators.text import (
    LM_ADD_K,
    ngram_lm_scores,
)


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


def _python_lm(rows, add_k=LM_ADD_K):
    """Independent reference: same add-k bigram model, plain dicts."""
    bi, uni = {}, {}
    for _id, text in rows:
        ts = _toks(text)
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for _id, text in rows:
        ts = _toks(text)
        if len(ts) < 2:
            continue
        lps = [
            math.log2(
                (bi.get((a, b), 0) + add_k) / (uni.get(a, 0) + add_k * v)
            )
            for a, b in zip(ts, ts[1:])
        ]
        out[_id] = sum(lps) / len(lps)
    return out


def test_matches_python_lm_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    want = _python_lm(rows)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_log2p, r.ppl)
        for r in ngram_lm_scores(docs).collect()
    }
    assert set(got) == set(want)
    texts = dict(rows)
    for doc_id, expected in want.items():
        n, avg, ppl = got[doc_id]
        assert avg == pytest.approx(expected, abs=1e-9)
        assert ppl == pytest.approx(2.0 ** -expected, rel=1e-9)
        assert n == len(_toks(texts[doc_id])) - 1


def test_tiny_corpus_exact(spark):
    # corpus: "a b a b" and "a b" -> bigrams: (a b)x3, (b a)x1;
    # unigrams: a x3, b x3; V=2; k=0.5
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.avg_log2p for r in ngram_lm_scores(docs).collect()
    }
    p_ab = (3 + 0.5) / (3 + 0.5 * 2)
    p_ba = (1 + 0.5) / (3 + 0.5 * 2)
    exp1 = (2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    assert got[1] == pytest.approx(exp1, abs=1e-12)
    assert got[2] == pytest.approx(math.log2(p_ab), abs=1e-12)


def test_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two tokens")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in ngram_lm_scores(docs).collect()}
    assert got == {3}


def test_reference_corpus_direction(spark):
    # train on a clean reference; in-distribution text must get lower
    # perplexity than unseen-vocab text
    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(100, "the cat sat"), (101, "zxq vvw qqj")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.ppl
        for r in ngram_lm_scores(score, train_docs=ref).collect()
    }
    assert got[100] < got[101]


def test_zero_add_k_rejected(spark):
    docs = spark.createDataFrame(
        [(1, "a b")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="add_k"):
        ngram_lm_scores(docs, add_k=0.0)
