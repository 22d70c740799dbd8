"""Trained char-n-gram language ID (Cavnar-Trenkle out-of-place):
held-out accuracy on synthetic languages with distinct character
distributions, plus exact distance agreement with an independent
pure-Python reference."""

from __future__ import annotations

import random

from peerdb_cdc_psql_clickhouse_spark.operators.text import (
    LANGID_PROFILE_K,
    classify_language,
    train_langid_profiles,
)

ALPHABETS = {
    "aaa": "abcde",
    "mmm": "lmnop",
    "zzz": "vwxyz",
}


def _word(rng, alpha):
    return "".join(rng.choice(alpha) for _ in range(rng.randint(2, 7)))


def _doc(rng, alpha, n_words=30):
    return " ".join(_word(rng, alpha) for _ in range(n_words))


def test_heldout_accuracy_on_distinct_alphabets(spark):
    rng = random.Random(7)
    train_rows, test_rows = [], []
    for li, (lang, alpha) in enumerate(sorted(ALPHABETS.items())):
        for j in range(20):
            train_rows.append((lang, _doc(rng, alpha)))
        for j in range(8):
            test_rows.append((li * 100 + j, lang, _doc(rng, alpha)))
    train = spark.createDataFrame(train_rows, "lang string, text string")
    profiles = train_langid_profiles(train)
    test = spark.createDataFrame(
        [(i, t) for i, _l, t in test_rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["predicted_lang"]
        for r in classify_language(test, profiles).collect()
    }
    want = {i: lang for i, lang, _t in test_rows}
    assert got == want  # 24/24 held-out docs


def test_distance_matches_python_reference(spark):
    train_rows = [
        ("xx", "abab abab baba"),
        ("yy", "cdcd cdcd dcdc"),
    ]
    train = spark.createDataFrame(train_rows, "lang string, text string")
    profiles = train_langid_profiles(train, top_k=30)
    test_text = "abab cd"
    test = spark.createDataFrame(
        [(1, test_text)], "doc_id long, text string"
    )
    rows = classify_language(
        test, profiles, top_k=30, doc_m=50
    ).collect()

    # independent reference -------------------------------------------------
    def grams_of(text, n=3):
        padded = "_" + "_".join(text.lower().split()) + "_"
        return [padded[i : i + n] for i in range(len(padded) - n + 1)]

    def ranked(gs, cap):
        from collections import Counter

        c = Counter(gs)
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        return {g: r + 1 for r, (g, _n) in enumerate(ordered[:cap])}

    prof = {
        lang: ranked(grams_of(text), 30) for lang, text in train_rows
    }
    doc_rank = ranked(grams_of(test_text), 50)
    want = {
        lang: sum(
            abs(dr - p[g]) if g in p else 30
            for g, dr in doc_rank.items()
        )
        for lang, p in prof.items()
    }
    best_lang = min(want, key=lambda k: (want[k], k))
    assert len(rows) == 1
    assert rows[0]["predicted_lang"] == best_lang
    assert rows[0]["oop_distance"] == want[best_lang]


def test_empty_doc_gets_no_row(spark):
    train = spark.createDataFrame(
        [("xx", "some training text here")], "lang string, text string"
    )
    profiles = train_langid_profiles(train)
    test = spark.createDataFrame(
        [(1, ""), (2, "some text")], "doc_id long, text string"
    )
    got = classify_language(test, profiles).collect()
    assert {r["doc_id"] for r in got} == {2}


def test_profile_shape(spark):
    train = spark.createDataFrame(
        [("aa", "aaaa bbbb"), ("bb", "cccc dddd")],
        "lang string, text string",
    )
    prof = train_langid_profiles(train).collect()
    per_lang = {}
    for r in prof:
        per_lang.setdefault(r["lang"], []).append(r["rank"])
    for lang, ranks in per_lang.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang
        assert len(ranks) <= LANGID_PROFILE_K
