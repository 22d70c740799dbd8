"""Positional inverted index + boolean / phrase search.

The retrieval face of the engine (the lexical complement of the ANN
indexes): one tokenize pass builds positional postings, and queries
resolve with work proportional to the QUERY TERMS' posting lists —
never a corpus scan. The persisted layout partitions postings by a
hash bucket of the term, so a search prunes to its terms' bucket
directories at the parquet scan, exactly like the IVF indexes prune
to probed cells: at 100 TB a query touches len(terms) buckets out of
n_buckets, and everything after the pruned scan is keyed joins on
doc_id-sized frames.

Phrase matching is pure positional algebra: term i of the phrase
contributes postings shifted by -i, so a phrase occurrence is a
(doc, base_position) present for ALL terms — one groupBy counting
distinct matched terms, no text re-scan, no regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import hash64
from .text import tokens_col

INDEX_BUCKETS = 64


def build_text_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = INDEX_BUCKETS,
) -> DataFrame:
    """(term, doc_id, positions array<int>, tf, bucket) positional
    postings — one tokenize + posexplode + (term, doc)-keyed agg, the
    single corpus shuffle of the build. positions are 0-based token
    offsets, sorted. bucket = portable hash of the term mod n_buckets
    (the partition column of the persisted layout)."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"),
    )
    return (
        toks.groupBy("term", id_col)
        .agg(
            F.array_sort(F.collect_list("pos")).alias("positions"),
            F.count("*").cast("long").alias("tf"),
        )
        .withColumn(
            "bucket", F.pmod(hash64(F.col("term")), F.lit(n_buckets))
        )
    )


def save_text_index(index: DataFrame, path: str) -> None:
    """Persist partitioned by bucket — a query's terms map to literal
    bucket ids, so the read prunes to those directories."""
    index.write.mode("overwrite").partitionBy("bucket").parquet(path)


def load_text_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _norm_terms(terms) -> list[str]:
    out = [t.lower() for t in terms if t and t.strip()]
    if not out:
        raise ValueError("query needs at least one non-empty term")
    return out


def _pruned(index: DataFrame, terms: list[str], n_buckets: int) -> DataFrame:
    """Filter postings to the query terms, with the bucket predicate
    FIRST so a persisted index prunes partitions before the term
    filter touches row groups."""
    import hashlib

    buckets = sorted(
        {
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % n_buckets
            for t in terms
        }
    )
    return index.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )


def term_search(
    index: DataFrame,
    terms,
    mode: str = "and",
    id_col: str = "doc_id",
    n_buckets: int = INDEX_BUCKETS,
) -> DataFrame:
    """Boolean retrieval: docs containing ALL (and) or ANY (or) of the
    terms, with match_terms + total tf. Work = the terms' postings
    only: pruned scan -> one doc-keyed agg."""
    terms = _norm_terms(terms)
    if mode not in ("and", "or"):
        raise ValueError("mode must be 'and' or 'or'")
    hits = (
        _pruned(index, terms, n_buckets)
        .groupBy(id_col)
        .agg(
            F.countDistinct("term").cast("long").alias("match_terms"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
    )
    if mode == "and":
        hits = hits.filter(F.col("match_terms") == len(terms))
    return hits


def phrase_search(
    index: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    n_buckets: int = INDEX_BUCKETS,
) -> DataFrame:
    """Exact consecutive-phrase retrieval: (doc_id, n_occurrences).
    Term i's postings shift by -i; a base position carried by all
    len(terms) DISTINCT terms is a phrase occurrence. Duplicate terms
    inside the phrase are handled by requiring every PHRASE SLOT to
    match: postings explode per (slot, base), so slot-distinct counts
    are exact even when the same term fills two slots."""
    terms = _norm_terms(phrase.split())
    n = len(terms)
    slots = None
    pruned = _pruned(index, terms, n_buckets)
    for i, t in enumerate(terms):
        s = (
            pruned.filter(F.col("term") == t)
            .select(
                id_col,
                F.explode("positions").alias("p"),
            )
            .select(
                id_col,
                (F.col("p") - i).alias("base"),
                F.lit(i).alias("slot"),
            )
        )
        slots = s if slots is None else slots.unionByName(s)
    occ = (
        slots.groupBy(id_col, "base")
        .agg(F.countDistinct("slot").alias("k"))
        .filter((F.col("k") == n) & (F.col("base") >= 0))
    )
    return occ.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_occurrences")
    )


BM25_K1 = 1.2
BM25_B = 0.75


def doc_lengths(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dl) token counts — one row-local pass; persisted
    alongside the postings in a real deployment (it is corpus-sized
    but narrow, and joins by doc_id only against MATCHED docs)."""
    return docs.select(
        F.col(id_col),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("dl"),
    )


def bm25_search(
    index: DataFrame,
    lengths: DataFrame,
    terms,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    n_buckets: int = INDEX_BUCKETS,
) -> DataFrame:
    """BM25-ranked top-k (doc_id, score, rank) for a bag of terms
    (Robertson/Sparck Jones, the public Okapi formula):

      score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl))
      idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)

    Work = the query terms' postings only: pruned scan -> df per term
    (tiny agg over the already-pruned postings) -> score + doc-keyed
    sum -> k-row window. N and avgdl come from the lengths table (two
    scalars, one agg). Ties break on doc_id ascending; scores round
    to 6 decimals for cross-run stability."""
    from pyspark.sql import Window

    from ..functions.numeric import fround

    terms = _norm_terms(terms)
    stats = lengths.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])

    post = _pruned(index, terms, n_buckets).select(id_col, "term", "tf")
    df_tbl = post.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    joined = (
        post.join(F.broadcast(df_tbl), "term")
        .join(lengths, id_col)
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    scored = (
        joined.select(id_col, contrib.alias("c"))
        .groupBy(id_col)
        .agg(fround(F.sum("c"), 6).alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", F.col("rank").cast("int").alias("rank"))
    )
