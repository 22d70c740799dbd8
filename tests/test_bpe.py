"""BPE tokenizer: learned merges and distributed encodings match an
independently-written reference implementation exactly; token
sequences round-trip their words; counting agrees with the corpus.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.operators.bpe import (
    EOW,
    bpe_apply_word,
    bpe_encode,
    bpe_word_counts,
    train_bpe,
)


# ---- independent reference (written against the Sennrich 2016
# pseudocode, structured differently from the operator code) ----------

def ref_train(word_freqs: dict[str, int], n_merges: int):
    vocab = {
        tuple(w) + (EOW,): c for w, c in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        stats: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        best_n = max(stats.values())
        best = min(p for p in stats if stats[p] == best_n)
        merges.append(best)
        pat = re.escape(" ".join(best))
        rx = re.compile(r"(?<!\S)" + pat + r"(?!\S)")
        nxt = {}
        for syms, c in vocab.items():
            joined = rx.sub("".join(best), " ".join(syms))
            nxt[tuple(joined.split(" "))] = c
        vocab = nxt
    return merges


def ref_encode_word(word: str, merges) -> list[str]:
    syms = list(word) + [EOW]
    for a, b in merges:  # rank order IS merge priority
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [a + b]
            else:
                i += 1
    return syms


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _word_freqs(spark, limit=None):
    rows = (
        bpe_word_counts(_docs(spark))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .collect()
    )
    if limit:
        rows = rows[:limit]
    return {r["word"]: r["cnt"] for r in rows}


def test_word_counts_match_python_counter(spark):
    texts = [r.text for r in _docs(spark).select("text").collect()]
    want = Counter(w for t in texts for w in t.lower().split())
    got = {r["word"]: r["cnt"] for r in bpe_word_counts(_docs(spark)).collect()}
    assert got == dict(want)


def test_merges_match_reference(spark):
    freqs = _word_freqs(spark)
    want = ref_train(freqs, 80)
    got = train_bpe(_docs(spark), n_merges=80, max_words=10**9)
    assert got == want


def test_encode_matches_reference_and_round_trips(spark):
    merges = train_bpe(_docs(spark), n_merges=120)
    enc = (
        bpe_encode(_docs(spark).limit(50), merges)
        .orderBy("doc_id")
        .collect()
    )
    texts = {
        r.doc_id: r.text
        for r in _docs(spark).limit(50).select("doc_id", "text").collect()
    }
    for row in enc:
        words = texts[row.doc_id].lower().split()
        want = [t for w in words for t in ref_encode_word(w, merges)]
        assert list(row.bpe_tokens) == want
        assert row.n_bpe_tokens == len(want)
        # lossless: stripping EOW and re-joining yields the words
        rebuilt, cur = [], ""
        for t in row.bpe_tokens:
            if t.endswith(EOW):
                rebuilt.append(cur + t[: -len(EOW)])
                cur = ""
            else:
                cur += t
        assert rebuilt == words


def test_rank_greedy_equals_sequential_merges(spark):
    # bpe_apply_word uses rank-greedy merging; the reference applies
    # merges sequentially — the two are equivalent for merges learned
    # by this trainer (each merge's parts exist before it fires)
    merges = train_bpe(_docs(spark), n_merges=150)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["the", "training", "quantization", "a", "zzzqqq"]:
        assert bpe_apply_word(w, ranks) == ref_encode_word(w, merges)


def test_truncated_vocab_still_learns_head_merges(spark):
    # max_words truncation keeps the Zipf head — the first merges
    # should be unchanged vs the full table (tail can't outvote head)
    full = train_bpe(_docs(spark), n_merges=30, max_words=10**9)
    cut = train_bpe(_docs(spark), n_merges=30, max_words=300)
    assert full[:10] == cut[:10]


def test_empty_and_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x")], "doc_id long, text string"
    )
    merges = train_bpe(_docs(spark), n_merges=20)
    rows = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    assert rows[1].n_bpe_tokens == 0
    assert rows[2].n_bpe_tokens == 0
    assert list(rows[3].bpe_tokens)[-1].endswith(EOW)
