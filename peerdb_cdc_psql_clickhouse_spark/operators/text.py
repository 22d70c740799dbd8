"""Text-analysis operators for training-data pipelines (SURVEY.md §2.4
O-X3 + build brief: language-ID, quality scoring, token counting,
document fingerprinting). All hot-path logic is built-in JVM functions
(split/explode/regexp) — no Python UDFs — so it whole-stage-codegens
and scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import hash64, hash64_sql
from ..registry import declare

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Real corpora would use a larger table; the
# mechanism (score = marker hits per language, argmax) is what scales.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish token pattern: runs of letters, runs of digits, or any single
# non-space symbol — a cheap proxy for subword tokenizers.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: F.Column) -> F.Column:
    """Whitespace tokenization with empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: count marker-word hits per language,
    pick the argmax (ties -> lexicographically first lang). Pure
    column expressions, no UDF. Tokenization is STAGED once instead of
    re-split per language score."""
    df = df.withColumn("_ltoks", tokens_col(F.col(text_col)))
    toks = F.col("_ltoks")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # array_max on (score, lang) structs gives max score with
    # lexicographic tiebreak on lang; we want smallest lang on ties,
    # so compare (score, reversed-rank) — simplest: sort_array desc on
    # (score asc, lang desc) inverted is fiddly; use aggregate fold.
    best = F.aggregate(
        F.array(*scores[1:]),
        scores[0],
        lambda acc, x: F.when(x.getField("score") > acc.getField("score"), x).otherwise(acc),
    )
    return df.withColumn("detected_lang", best.getField("lang")).drop(
        "_ltoks"
    )


@declare(
    "x3_top_terms",
    """
SELECT term, COUNT(*) AS cnt FROM (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
) WHERE term <> ''
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 20
""",
    doc="O-X3 tokenize + explode + top-terms (training-data term stats); "
    "map-side partial aggregation keeps the shuffle tiny",
)
def x3_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO fan_out here (r18 opt, measured): plain tokenize+count is too
    # cheap per row for a round-robin shuffle of the raw text to pay
    # (A/B: fan_out cost +0.28 s at sf0.1, jobs 2->3); the heavy
    # signal battery (doc_signals) is where fan_out wins.
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(20)
    )


def _lang_score_sql(lang: str) -> str:
    markers = tuple(LANG_MARKERS[lang])
    return (
        "len(list_filter(list_filter(string_split_regex(lower(text), "
        f"'\\s+'), t -> t <> ''), t -> t IN {markers!r}))"
    )


def _lang_id_oracle() -> str:
    """DuckDB equivalent of detect_language() over documents —
    (doc_id, lang, detected_lang). Composed by the x7 pipeline oracle."""
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_lang_score_sql('de')} AS s_de,
         {_lang_score_sql('en')} AS s_en,
         {_lang_score_sql('es')} AS s_es,
         {_lang_score_sql('fr')} AS s_fr
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS detected_lang
FROM scored
"""


LANG_ID_ORACLE = _lang_id_oracle()


@declare(
    "x3b_doc_signals",
    f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS toks,
         {_lang_score_sql('de')} AS s_de,
         {_lang_score_sql('en')} AS s_en,
         {_lang_score_sql('es')} AS s_es,
         {_lang_score_sql('fr')} AS s_fr
  FROM documents
), grams AS (
  SELECT *,
         list_transform(
           generate_series(1, greatest(len(toks) - 2, 1)),
           i -> array_to_string(toks[i:i+2], ' ')) AS gs
  FROM scored
)
SELECT doc_id,
       len(toks) AS token_cnt,
       FLOOR((CAST(len(list_filter(toks, t -> t IN {STOPWORDS!r}))
              AS DOUBLE) / NULLIF(len(toks), 0)) * 10000.0 + 0.5)
       / 10000.0 AS stopword_ratio,
       FLOOR((CAST(length(text) AS DOUBLE) / NULLIF(len(toks), 0))
             * 10000.0 + 0.5) / 10000.0 AS avg_token_len,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS bpe_ish_tokens,
       {hash64_sql('text')} AS fingerprint,
       FLOOR((CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) /
              len(gs)) * 10000.0 + 0.5) / 10000.0 AS dup_ngram_frac,
       lang,
       CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS detected_lang
FROM grams
""",
    doc="O-X3/brief per-document signal battery in ONE scan: quality "
    "scoring (token count, stopword ratio, mean token length), BPE-ish "
    "subword token counting (letters/digits/symbol runs — context-"
    "length budgeting proxy), 60-bit md5 content fingerprint, Gopher-"
    "style duplicate-3-gram fraction (repetition filter), and "
    "stopword-marker language-ID (argmax over per-language hit counts, "
    "earliest lang wins ties). All row-local column expressions: zero "
    "shuffle, one pass over the corpus — at 100 TB this is the "
    "signals stage of the selection pipeline, and computing the five "
    "signal families per-query would cost five corpus scans instead "
    "of one. Token/gram arrays are STAGED columns (never re-derived "
    "inside lambdas — the measured 64x x3f lesson).",
)
def x3b_doc_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_signals(load_table(spark, sf_dir, "documents"))


def doc_signals(docs: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    """The x3b signal battery over an arbitrary documents frame.
    `passthrough` columns (e.g. source, n_chars) ride the SAME single
    scan projection — consumers that need them alongside the signals
    (corpus_report) must never join the battery back to its own input
    (a corpus-to-corpus shuffle at scale)."""
    from ..functions.numeric import fround
    from ..plans.layout import fan_out

    # the signal battery is the per-row hot loop (4-language marker
    # scoring, 3-gram array, regex token count, md5): rebalance
    # single-split inputs across cores first (r18 opt; no-op on real
    # multi-split inputs — the winnow_fp discipline)
    docs = fan_out(docs)
    staged = detect_language(docs, "text").select(
        "doc_id",
        "lang",
        "detected_lang",
        "text",
        *passthrough,
        tokens_col(F.col("text")).alias("_toks"),
    )
    grams = staged.withColumn(
        "_grams",
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("_toks") - 2, F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice("_toks", i, 3)),
        ),
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.size("_toks")
    n_stop = F.size(
        F.filter("_toks", lambda t: F.array_contains(stop_arr, t))
    )
    n_gram = F.size("_grams")
    return grams.select(
        "doc_id",
        n_tok.cast("long").alias("token_cnt"),
        fround(
            n_stop.cast("double") / F.nullif(n_tok, F.lit(0)), 4
        ).alias("stopword_ratio"),
        fround(
            F.length("text").cast("double") / F.nullif(n_tok, F.lit(0)), 4
        ).alias("avg_token_len"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_PATTERN), 0))
        .cast("long")
        .alias("bpe_ish_tokens"),
        hash64(F.col("text")).alias("fingerprint"),
        fround(
            (n_gram - F.size(F.array_distinct("_grams"))).cast("double")
            / n_gram,
            4,
        ).alias("dup_ngram_frac"),
        "lang",
        "detected_lang",
        *passthrough,
    )


WINNOW_W = 4  # window of consecutive shingle hashes per fingerprint
WINNOW_SHINGLE_K = 5  # tokens per shingle feeding the winnow windows


# winnowing fingerprints as a DuckDB CTE (ends with `fp(doc_id,
# fingerprint)`), shared by the x3f oracle and the x1e cluster oracle
WINNOW_FP_CTE = f"""
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS tokens
  FROM documents
), hashes AS (
  SELECT doc_id,
         list_transform(
           list_transform(
             generate_series(1, greatest(len(tokens) - {WINNOW_SHINGLE_K} + 1, 1)),
             i -> array_to_string(tokens[i:i+{WINNOW_SHINGLE_K - 1}], ' ')),
           s -> CAST(CONCAT('0x', SUBSTR(md5(s), 1, 15)) AS BIGINT)
         ) AS hs
  FROM toks
), fp AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(
           generate_series(1, greatest(len(hs) - {WINNOW_W} + 1, 1)),
           i -> list_min(hs[i:i+{WINNOW_W - 1}])))) AS fingerprint
  FROM hashes
)"""


def winnow_fp(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) winnowing fingerprints of `text`."""
    from ..operators.dedup import _shingles_of, _tokens
    from ..plans.layout import fan_out

    # hashing is the per-row hot loop: rebalance single-split inputs
    # across cores first (no-op-cost on real multi-split inputs)
    docs = fan_out(docs)
    # Stage tokens, then the hash array, each as a real column before
    # the next stage's lambdas: inlining either makes Catalyst
    # re-evaluate the whole O(n) array per element (O(n^2) per doc —
    # measured 218 s vs <1 s at sf0.1 for the hash array). Multiple
    # references to a non-cheap alias keep CollapseProject from
    # re-inlining.
    hashed = docs.select(
        "doc_id", _tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id",
        F.transform(
            _shingles_of(F.col("_toks"), WINNOW_SHINGLE_K), hash64
        ).alias("_hs"),
    )
    hs = F.col("_hs")
    n = F.size(hs)
    idx = F.sequence(F.lit(1), F.greatest(n - WINNOW_W + 1, F.lit(1)))
    minima = F.transform(
        idx, lambda i: F.array_min(F.slice(hs, i, WINNOW_W))
    )
    return hashed.select(
        "doc_id",
        F.explode(F.array_distinct(minima)).alias("fingerprint"),
    )


@declare(
    "x3f_winnowing",
    f"WITH {WINNOW_FP_CTE}\nSELECT doc_id, fingerprint FROM fp",
    doc="O-X3/brief: winnowing document fingerprints (rolling scheme: "
    "minimum shingle hash per sliding window of {w}) — the standard "
    "robust fingerprint for near-dup/plagiarism detection. Fully "
    "row-local (array folds + array_distinct before the explode, so "
    "the per-doc set is deduped map-side); result is scalar rows "
    "(doc_id, fingerprint), never array-typed columns, for "
    "engine-portable hashing".format(w=WINNOW_W),
)
def x3f_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fp(load_table(spark, sf_dir, "documents"))


TFIDF_TOP_K = 3


@declare(
    "x3g_tfidf",
    f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
), n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         FLOOR(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0)
               * 10000.0 + 0.5) / 10000.0 AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tf, tfidf FROM ranked WHERE rn <= {TFIDF_TOP_K}
""",
    doc="O-X3/brief: per-document TF-IDF top terms (smoothed idf = "
    "ln((N+1)/(df+1))+1, scikit-style). Distributed shape: row-local "
    "tokenize+explode, partial-agg tf keyed on (doc, term), vocab-"
    "sized df table joined on term (AQE picks broadcast when the "
    "vocab is small), scalar N via a broadcast cross join, top-k per "
    "doc by window row_number — never a global sort. Ties broken by "
    "term; scores fixed-point rounded on both engines.",
)
def x3g_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.numeric import fround

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    # r18 opt (guide §2.3): (doc_id, term) is already distinct in tf,
    # so COUNT per term over tf == COUNT(DISTINCT doc_id) per term
    # over the raw token stream — deriving dfreq from tf drops the
    # count_distinct's two-phase expand over the full token stream.
    # No persist and no fan_out (A/B-measured: both cost more than
    # the recompute at this per-row weight).
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        "tf",
        fround(
            F.col("tf")
            * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
            4,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_K)
        .drop("rn")
    )


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al.
    2021 §A1.1, public paper): fraction of duplicate word n-grams and
    of duplicate sentences — boilerplate/low-quality docs repeat
    themselves. Entirely row-local array expressions (one corpus scan,
    zero shuffle), same signals-stage discipline as x3b_doc_signals.

    Output: (id, ngram_cnt, dup_ngram_frac, sentence_cnt,
    dup_sentence_frac) with fractions in [0, 1), 0 for degenerate
    (shorter-than-n) docs.
    """
    from ..functions.numeric import fround

    # stage arrays as real columns first — referencing a non-trivial
    # expression inside transform() lambdas re-evaluates it per
    # element (the measured 64x x3f lesson, NOTES_r1)
    staged = docs.select(
        F.col(id_col),
        tokens_col(F.col(text_col)).alias("_toks"),
        F.filter(
            F.transform(
                F.split(F.col(text_col), r"[.!?]\s+|[.!?]$"),
                lambda s: F.trim(s),
            ),
            lambda s: s != "",
        ).alias("_sents"),
    )
    grams = staged.withColumn(
        "_grams",
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("_toks") - (n - 1), F.lit(1)),
            ),
            lambda i: F.concat_ws(" ", F.slice("_toks", i, n)),
        ),
    )

    def dup_frac(arr: str) -> F.Column:
        total = F.size(F.col(arr))
        uniq = F.size(F.array_distinct(F.col(arr)))
        return fround(
            (total - uniq).cast("double") / F.nullif(total, F.lit(0)), 4
        )

    return grams.select(
        F.col(id_col),
        F.size("_grams").cast("long").alias("ngram_cnt"),
        F.coalesce(dup_frac("_grams"), F.lit(0.0)).alias(
            "dup_ngram_frac"
        ),
        F.size("_sents").cast("long").alias("sentence_cnt"),
        F.coalesce(dup_frac("_sents"), F.lit(0.0)).alias(
            "dup_sentence_frac"
        ),
    )


# -- PII signals / scrubbing (brief: training-data hygiene) -----------------
# Conservative, public regex patterns; counts are row-local regexp
# passes, masking is chained regexp_replace — all JVM-side, zero
# shuffle, one scan. Real deployments would swap in stricter patterns
# per policy; the OPERATOR SHAPE (count + mask in one projection) is
# what scales.

PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d().\-\s]{7,}\d",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask: str = "[PII]",
) -> DataFrame:
    """(id, n_email, n_phone, n_ipv4, pii_total, masked_text): per-doc
    PII match counts plus the text with every match replaced by
    `mask`. Masking order is fixed (email, phone, ipv4) so overlapping
    matches resolve deterministically."""
    counts = {
        name: F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
        ).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    masked = F.col(text_col)
    for pat in PII_PATTERNS.values():
        masked = F.regexp_replace(masked, pat, mask)
    return docs.select(
        F.col(id_col),
        *[c.alias(f"n_{n}") for n, c in counts.items()],
        sum(counts.values()).alias("pii_total"),
        masked.alias("masked_text"),
    )


# -- benchmark contamination check (brief: eval hygiene) --------------------

def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Docs sharing >= min_shared distinct word n-grams with ANY
    benchmark item — the train/test contamination screen run before
    training. Returns (id, shared_ngrams, contaminated).

    Shape: benchmark n-grams are a small distinct set -> broadcast to
    the corpus-side keyed join on gram (never a cross join); corpus
    grams are staged row-local arrays exploded once. At 100 TB the
    corpus side is one scan + one keyed aggregation, and the benchmark
    side stays driver-small by construction (eval sets are tiny)."""
    from ..operators.dedup import _shingles_of, _tokens

    bench_grams = (
        benchmark.select(_tokens(F.col(bench_text_col)).alias("_toks"))
        .select(
            F.explode(
                F.array_distinct(_shingles_of(F.col("_toks"), n))
            ).alias("gram")
        )
        .distinct()
    )
    doc_grams = (
        docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(_shingles_of(F.col("_toks"), n))
            ).alias("gram"),
        )
    )
    shared = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(shared, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("shared_ngrams"), F.lit(0).cast("long")).alias(
                "shared_ngrams"
            ),
            (
                F.coalesce(F.col("shared_ngrams"), F.lit(0)) >= min_shared
            ).alias("contaminated"),
        )
    )



# -- Bloom-filter contamination screen (scale path) -------------------------
#
# contamination_flags broadcasts the benchmark's distinct n-grams —
# right when the benchmark is an eval set (thousands of grams), wrong
# when screening against a LARGE reference (another corpus's shingle
# table, millions+ of grams): the broadcast grows with the reference
# and the corpus pays a join. A Bloom filter fixes the cost: the
# reference compresses to a FIXED m-bit array (128 KiB default)
# shipped as a plan literal, and the corpus side becomes one scan of
# row-local arithmetic — no join, no shuffle, no false NEGATIVES
# (every truly-shared gram always hits; a tunable false-positive rate
# inflates shared_ngrams slightly, the right direction for a
# contamination screen, which quarantines for exact re-check).
#
# Public construction: standard Bloom with Kirsch-Mitzenmacher double
# hashing (h_i = a + i*b — same functions.hashing.hash_pair the
# MinHash family uses), 32-bit words so the probe-side bit test stays
# in exact-double range (word / 2^bit with word < 2^32 is exact; Spark
# lacks variable-distance shifts inside lambdas).

BLOOM_M_BITS = 1 << 20  # 128 KiB of filter
BLOOM_K = 5


class BloomFilter:
    """Driver-held bloom bitset: m_bits/32 uint32 words in a plain
    list (plan-literal friendly). Build with bloom_build()."""

    def __init__(self, m_bits: int, k: int, words: list[int], n_items: int):
        self.m_bits = m_bits
        self.k = k
        self.words = words
        self.n_items = n_items

    @property
    def fp_rate(self) -> float:
        """Theoretical false-positive rate (1 - e^{-kn/m})^k."""
        import math

        return (1.0 - math.exp(-self.k * self.n_items / self.m_bits)) ** self.k


def _bloom_positions(col: F.Column, m_bits: int, k: int) -> F.Column:
    """array<long> of the k bloom bit positions for a string column."""
    from ..functions.hashing import hash_pair

    a, b = hash_pair(col)
    return F.array(*[(a + i * b) % F.lit(m_bits) for i in range(k)])


def bloom_build(
    items: DataFrame,
    col: str = "gram",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> BloomFilter:
    """Distributed build: bit positions computed corpus-side, then the
    DISTINCT positions come back to the driver — a collect bounded by
    the filter size m_bits (1M rows max at the default), never by the
    reference's row count. The words array is what callers ship into
    bloom_contamination_flags (128 KiB literal at defaults)."""
    pos_rows = (
        items.select(
            F.explode(_bloom_positions(F.col(col), m_bits, k)).alias("pos")
        )
        .distinct()
        .collect()
    )
    n_items = items.count()
    words = [0] * ((m_bits + 31) // 32)
    for r in pos_rows:
        p = r["pos"]
        words[p >> 5] |= 1 << (p & 31)
    return BloomFilter(m_bits, k, words, n_items)


def bloom_contamination_flags(
    docs: DataFrame,
    bloom: BloomFilter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """contamination_flags' output contract — (id, shared_ngrams,
    contaminated) — against a Bloom filter instead of a broadcast gram
    join. shared_ngrams counts distinct doc grams whose k bloom bits
    are ALL set: a superset of the exact count (no false negatives;
    ~fp_rate of clean grams inflate it). One corpus scan, zero
    shuffle past the per-doc agg; the filter ships as ONE array cell
    in a broadcast 1-row frame — NOT a plan literal: an F.lit(list)
    of 32k words compiles to a 32k-child CreateArray whose
    analysis/codegen costs ~16 s of fixed overhead per query
    (measured; the broadcast form is ~1.7 s and carries the same
    128 KiB). A 10M-gram reference costs the same as a 10k-gram one
    either way.

    Probe staging: grams explode to rows so the md5 is computed ONCE
    per gram as a staged column — the earlier in-lambda form
    re-derived it per bloom position (2k md5 evaluations per gram;
    measured 6x slower at 10x scale). The a + i*b positions, the word
    lookups, and the bit tests are all arithmetic off that one staged
    hex column; the per-doc count is a map-combined agg on id (the
    explode never shuffles gram rows)."""
    from ..functions.hashing import HASH_PAIR_LIM
    from ..operators.dedup import _shingles_of, _tokens

    from ..functions.values import values_frame

    words_df = values_frame(
        docs.sparkSession, [(bloom.words,)], "_bloom_w array<bigint>"
    )
    m, k = bloom.m_bits, bloom.k

    gram_rows = (
        docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(_shingles_of(F.col("_toks"), n))
            ).alias("_gram"),
        )
        .crossJoin(F.broadcast(words_df))
        .withColumn("_m", F.md5(F.col("_gram")))
    )
    hexes = F.col("_m")
    a = F.conv(F.substring(hexes, 1, 15), 16, 10).cast("long") % HASH_PAIR_LIM
    b = F.conv(F.substring(hexes, 17, 15), 16, 10).cast("long") % HASH_PAIR_LIM
    staged = gram_rows.select(
        id_col, "_bloom_w", a.alias("_a"), b.alias("_b")
    )

    def bit_set(pos: F.Column) -> F.Column:
        # word is uint32 in a long; word / 2^bit stays exact in
        # double, floor%2 extracts the bit (no variable shifts needed)
        word = F.element_at(
            F.col("_bloom_w"), (F.floor(pos / F.lit(32.0)) + 1).cast("int")
        )
        return (
            F.floor(word / F.pow(F.lit(2.0), pos % 32)).cast("long") % 2
            == 1
        )

    hit = bit_set((F.col("_a")) % F.lit(m))
    for i in range(1, k):
        hit = hit & bit_set((F.col("_a") + i * F.col("_b")) % F.lit(m))
    shared = (
        staged.select(id_col, hit.alias("_hit"))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("_hit"), 1).otherwise(0))
            .cast("long")
            .alias("shared_ngrams")
        )
    )
    return (
        docs.select(id_col)
        .join(shared, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col("shared_ngrams"), F.lit(0).cast("long")
            ).alias("shared_ngrams"),
            (
                F.coalesce(F.col("shared_ngrams"), F.lit(0)) >= min_shared
            ).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# N-gram LM perplexity scoring — the CCNet-style quality signal
# (public method: score documents by a language model's perplexity;
# CCNet used a wiki-trained KenLM). No pretrained model ships here, so
# the LM is TRAINED DISTRIBUTED from a reference corpus (bigrams,
# add-k smoothing) and applied as a join — both halves are DataFrame
# jobs, usable at 100 TB:
#   train: one shuffle each for bigram and unigram counts;
#   score: doc bigrams LEFT JOIN the count tables (unseen pairs get
#   the smoothed floor), one agg per doc. Vocab size enters as a
#   broadcast scalar.
# ---------------------------------------------------------------------------

LM_ADD_K = 0.5


def ngram_lm_scores(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = LM_ADD_K,
    quantize: int | None = None,
) -> DataFrame:
    """(id, n_bigrams, avg_log2p, ppl): per-document average bigram
    log2-probability and perplexity under an add-k-smoothed bigram LM
    trained on `train_docs` (default: the scored corpus itself —
    self-perplexity, the repetition/outlier signal; pass a clean
    reference corpus for the CCNet-style quality filter).

    P(w2|w1) = (C(w1 w2) + k) / (C(w1) + k*V), V = training vocab.
    Docs with < 2 tokens produce NO output row (no bigrams to score —
    left-join the result back to the corpus to enumerate them).

    add_k must be > 0: unsmoothed MLE (k=0) turns unseen bigrams into
    log2(0) = NULL, which a count-based average would silently absorb
    into a plausible wrong score.

    quantize=N switches to the cross-engine-deterministic profile the
    declared x3h query needs: per-bigram log2-probs are fixed-point
    floor-rounded to N dp BEFORE the sum, the sum runs in DECIMAL
    (order-insensitive exact), and avg/ppl are floor-rounded — so the
    result hashes identically against the DuckDB oracle. Default None
    keeps full double precision for API callers.
    """
    from ..plans.layout import fan_out, reuse

    if add_k <= 0:
        raise ValueError("add_k must be > 0 (smoothing floor)")
    train = train_docs if train_docs is not None else docs

    def token_pairs(frame: DataFrame, keep_id: bool) -> DataFrame:
        """(id?, w1, w2) — one row per TOKEN, w2 = following token or
        NULL for each document's last token. One tokenization serves
        both count tables (r18 opt: the bigram-string form needed a
        SECOND tokenize pass for unigram counts — the before-plan
        showed three full corpus tokenizations for x3h; this shape
        needs exactly one). F.get is 0-based and NULL out-of-bounds
        (ANSI-safe), so the last token pairs with NULL."""
        staged = fan_out(frame).select(
            *([F.col(id_col)] if keep_id else []),
            tokens_col(F.col(text_col)).alias("_toks"),
        )
        toks = F.col("_toks")
        pairs = F.transform(
            toks,
            lambda t, i: F.struct(
                t.alias("w1"), F.get(toks, i + 1).alias("w2")
            ),
        )
        return staged.select(
            *([F.col(id_col)] if keep_id else []),
            F.explode(pairs).alias("_p"),
        ).select(
            *([F.col(id_col)] if keep_id else []),
            F.col("_p.w1").alias("w1"),
            F.col("_p.w2").alias("w2"),
        )

    doc_stream = token_pairs(docs, keep_id=True)
    if train_docs is None:
        # self-train: the scored corpus's token stream IS the
        # training stream — share one tokenization pass instead of
        # re-deriving it (the corpus_report reuse discipline)
        doc_stream = reuse(doc_stream)
        train_stream = doc_stream
    else:
        # train referenced by both count tables below — persist it
        train_stream = reuse(token_pairs(train, keep_id=False))
    doc_bi = doc_stream.filter(F.col("w2").isNotNull())
    # bigram counts keyed by the (w1, w2) PAIR: tokens contain no
    # whitespace (split on \s+), so pair equality == equality of the
    # old "w1 w2" concatenated key — identical counts, minus the
    # concat and the re-split
    bi_counts = doc_bi.select("w1", "w2") if train_docs is None else (
        train_stream.filter(F.col("w2").isNotNull())
    )
    bi_counts = bi_counts.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    )
    # denominator is the RAW unigram count, which includes each
    # document's final token even though that token never opens a
    # bigram — so sum_w2 P(w2|w1) < 1 by a hair. Deliberate CCNet-
    # style approximation (ADVICE r3): one token stream serves both
    # counts, and the test oracles model the same choice. The (w1,
    # NULL) last-token rows are exactly the tokens the bigram stream
    # loses, so grouping the FULL stream by w1 reproduces the raw
    # count. reuse(): uni_counts feeds both the w1 join and the
    # vocab-size aggregate; the persisted frame is vocab-sized.
    uni_counts = reuse(
        train_stream.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni_counts.agg(
        F.count(F.lit(1)).cast("double").alias("_v")
    )
    lp = F.log2(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(add_k))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k) * F.col("_v"))
    )
    if quantize is not None:
        from ..functions.numeric import fround

        lp = fround(lp, quantize)
    scored = (
        doc_bi.join(bi_counts, ["w1", "w2"], "left")
        .join(uni_counts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(id_col, lp.alias("_lp"))
    )
    # count('_lp'), not count(*): if a degenerate input ever yields a
    # NULL log-prob despite the add_k guard, the average goes NULL
    # instead of silently averaging over fewer terms
    if quantize is not None:
        from ..functions.numeric import fround

        dec_sum = F.sum(
            F.col("_lp").cast(f"decimal(28,{quantize})")
        ).cast("double")
        avg = fround(dec_sum / F.count("_lp"), quantize)
        return scored.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            avg.alias("avg_log2p"),
            fround(F.pow(F.lit(2.0), -avg), 4).alias("ppl"),
        )
    avg = F.sum("_lp") / F.count("_lp")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        avg.alias("avg_log2p"),
        F.pow(F.lit(2.0), -avg).alias("ppl"),
    )


LM_QUANT = 6  # fixed-point dp for the declared-query log-prob stream


def _lm_oracle_sql(add_k: float, q: int = LM_QUANT) -> str:
    from ..functions.numeric import fround_sql

    lp = fround_sql(f"log2((c2.c2 + {add_k}) / (uni.c1 + {add_k} * v.v))", q)
    avg = fround_sql(
        f"CAST(SUM(CAST(lp AS DECIMAL(28,{q}))) AS DOUBLE) / COUNT(lp)", q
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS tokens
  FROM documents
), bi AS (
  SELECT doc_id, tokens[i] AS w1,
         tokens[i] || ' ' || tokens[i + 1] AS bigram
  FROM toks, UNNEST(generate_series(1, len(tokens) - 1)) AS t(i)
  WHERE len(tokens) >= 2
), c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bi GROUP BY 1),
uni AS (
  SELECT w1, COUNT(*) AS c1
  FROM (SELECT unnest(tokens) AS w1 FROM toks) GROUP BY 1
), v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
lp AS (
  SELECT bi.doc_id, {lp} AS lp
  FROM bi JOIN c2 USING (bigram) JOIN uni USING (w1) CROSS JOIN v
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, {avg} AS avg_log2p
  FROM lp GROUP BY doc_id
)
SELECT doc_id, n_bigrams, avg_log2p,
       {fround_sql("POW(2.0, -avg_log2p)", 4)} AS ppl
FROM per_doc
"""


@declare(
    "x3h_lm_perplexity",
    _lm_oracle_sql(LM_ADD_K),
    doc="O-X3/brief: per-document perplexity under an add-k-smoothed "
    "bigram LM self-trained on the corpus (the CCNet quality-filter "
    "shape; self-perplexity doubles as a repetition/outlier signal). "
    "Distributed shape: the scored corpus's bigram stream IS the "
    "training stream (one shared tokenization pass via reuse()); LM "
    "training = two partial-agg counts; scoring = two keyed joins + "
    "one broadcast scalar (vocab size) + per-doc agg. Promoted from "
    "pytest-only to the declared hash surface in r4: per-bigram "
    f"log2-probs fixed-point rounded at {LM_QUANT} dp then DECIMAL-"
    "summed, so the float stream hashes identically vs DuckDB.",
)
def x3h_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_lm_scores(
        load_table(spark, sf_dir, "documents"), quantize=LM_QUANT
    )


# ---------------------------------------------------------------------------
# Trained character-n-gram language ID (Cavnar-Trenkle 1994 "N-Gram-
# Based Text Categorization" — the classic out-of-place rank method,
# the public ancestor of langid/fastText profiles). Unlike the
# marker-word heuristic (detect_language), this TRAINS on a labeled
# corpus: per-language profiles of the top-K character n-grams by
# frequency rank, classification = argmin sum of rank displacements.
#
# Distributed shape:
#   train: one char-gram explode (row-local) + one (lang, gram) count
#          shuffle + per-lang top-K window -> a langs x K profile
#          table, tiny by construction (broadcast forever after);
#   classify: per-doc top-M grams (one (doc, gram) shuffle + window),
#          broadcast-join the profile, one per-doc argmin agg.
# ---------------------------------------------------------------------------

LANGID_N = 3
LANGID_PROFILE_K = 200
LANGID_DOC_M = 50


def train_langid_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = LANGID_N,
    top_k: int = LANGID_PROFILE_K,
) -> DataFrame:
    """(lang, gram, rank): per-language frequency-rank profile of the
    top_k character n-grams. Ties broken by gram for determinism."""
    from pyspark.sql import Window

    grams = _explode_char_grams(docs, text_col, n, keep=[lang_col])
    counts = grams.groupBy(lang_col, "gram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.desc("_c"), F.asc("gram")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col(lang_col).alias("lang"), "gram", "rank")
    )


def _explode_char_grams(
    docs: DataFrame, text_col: str, n: int, keep: list
) -> DataFrame:
    staged = docs.select(
        *keep,
        F.concat(
            F.lit("_"),
            F.regexp_replace(F.lower(F.col(text_col)), r"\s+", "_"),
            F.lit("_"),
        ).alias("_pt"),
    )
    pt = F.col("_pt")
    idx = F.when(
        F.length(pt) >= n, F.sequence(F.lit(1), F.length(pt) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return staged.select(
        *keep,
        F.explode(
            F.transform(idx, lambda i: F.substring(pt, i, n))
        ).alias("gram"),
    )


def classify_language(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = LANGID_N,
    top_k: int = LANGID_PROFILE_K,
    doc_m: int = LANGID_DOC_M,
) -> DataFrame:
    """(id, predicted_lang, oop_distance): out-of-place classification
    against trained profiles. Distance per language = sum over the
    doc's top doc_m grams of |doc_rank - profile_rank|, with top_k as
    the displacement for grams absent from the profile (the
    Cavnar-Trenkle max-penalty convention). Docs with NO grams (empty
    text) get no row — left-join downstream to enumerate.

    The profile table is langs x top_k rows — broadcast by
    construction; a doc never shuffles against the corpus."""
    from pyspark.sql import Window

    grams = _explode_char_grams(docs, text_col, n, keep=[F.col(id_col)])
    counts = grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_c"), F.asc("gram"))
    doc_prof = (
        counts.withColumn("doc_rank", F.row_number().over(w))
        .filter(F.col("doc_rank") <= doc_m)
        .select(id_col, "gram", "doc_rank")
    )
    langs = profiles.select("lang").distinct()
    # every (doc gram, lang) pair scores: matched -> |dr - pr|,
    # unmatched -> top_k. The doc profile crosses the tiny lang list,
    # then left-joins the broadcast profile on (lang, gram).
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["lang", "gram"], "left")
        .select(
            id_col,
            "lang",
            F.coalesce(
                F.abs(F.col("doc_rank") - F.col("rank")),
                F.lit(top_k),
            ).alias("_disp"),
        )
    )
    dist = scored.groupBy(id_col, "lang").agg(
        F.sum("_disp").cast("long").alias("oop_distance")
    )
    best = dist.groupBy(id_col).agg(
        F.min_by(
            F.struct(F.col("lang"), F.col("oop_distance")),
            F.struct(F.col("oop_distance"), F.col("lang")),
        ).alias("_best")
    )
    return best.select(
        id_col,
        F.col("_best.lang").alias("predicted_lang"),
        F.col("_best.oop_distance").alias("oop_distance"),
    )
