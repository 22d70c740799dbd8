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
    """(term, doc_id, positions array<int>, tf, dl, bucket)
    positional postings — one tokenize + posexplode + (term,
    doc)-keyed agg, the single corpus shuffle of the build. positions
    are 0-based token offsets, sorted. bucket = portable hash of the
    term mod n_buckets (the partition column of the persisted
    layout).

    dl (the doc's total token count) is DENORMALIZED into every
    posting row at build time (r5): BM25's length normalization then
    reads it off the pruned postings themselves — no per-query join
    against a corpus-sized lengths table, which at 100 TB would have
    been a full narrow-table scan per search. Costs one extra long
    per posting row plus one doc-keyed exchange at build time (the
    window below) — both amortized over every later search."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"),
    )
    per_doc = toks.groupBy("term", id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("positions"),
        F.count("*").cast("long").alias("tf"),
    )
    return per_doc.select(
        "*",
        F.sum("tf").over(Window.partitionBy(id_col)).alias("dl"),
        F.pmod(hash64(F.col("term")), F.lit(n_buckets)).alias("bucket"),
        # insertion generation (r8 delete lifecycle): build rows are
        # gen 0; text_index_insert stamps each batch with the next
        # generation, and a tombstone (doc_id, up_to_gen) hides
        # exactly the generations at or below the deleted version —
        # so delete-then-reinsert needs no compaction to be visible
        F.lit(0).cast("long").alias("_gen"),
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
    filter touches row groups. Bucket ids come from python_hash64 —
    the one driver-side twin of the hash64 the index was built with
    (ADVICE r4: a private reimplementation here could silently drift
    and prune the wrong partitions)."""
    from ..functions.hashing import python_hash64

    buckets = sorted({python_hash64(t) % n_buckets for t in terms})
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
        F.lit(0).cast("long").alias("_gen"),
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
    stats: tuple[int, int] | None = None,
) -> DataFrame:
    """BM25-ranked top-k (doc_id, score, rank) for a bag of terms
    (Robertson/Sparck Jones, the public Okapi formula):

      score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl))
      idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)

    Work = the query terms' postings only: pruned scan -> df per term
    (tiny agg over the already-pruned postings) -> score + doc-keyed
    sum -> k-row window. N and avgdl come from `stats` (n_docs,
    sum_dl) when given — the persisted index statistics, the 100 TB
    path — else from one agg over the lengths table; avgdl = exact
    integer sum / count either way, so the scalar is bit-identical
    across engines. dl per matched doc is read off the postings
    themselves when the index carries the denormalized `dl` column
    (build_text_index r5); only a pre-r5 index falls back to the
    per-query lengths join. Ties break on doc_id ascending.
    Determinism: each term contribution is fixed-point rounded to 6
    decimals and summed as DECIMAL — order-insensitive exact
    addition, so the score survives any partial-agg order AND
    replays exactly in the DuckDB oracle (registry determinism
    rules)."""
    from pyspark.sql import Window

    from ..functions.numeric import fround

    terms = _norm_terms(terms)
    if stats is None:
        st = lengths.agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
        ).collect()[0]
        stats = (int(st["n_docs"]), int(st["sum_dl"]))
    n_docs, sum_dl = stats
    avgdl = sum_dl / n_docs  # exact ints -> one IEEE div

    has_dl = "dl" in index.columns
    post = _pruned(index, terms, n_buckets).select(
        id_col, "term", "tf", *(["dl"] if has_dl else [])
    )
    df_tbl = post.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    joined = post.join(F.broadcast(df_tbl), "term")
    if not has_dl:
        joined = joined.join(lengths, id_col)
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    scored = (
        joined.select(
            id_col, fround(contrib, 6).cast("decimal(28,6)").alias("c")
        )
        .groupBy(id_col)
        .agg(F.sum("c").cast("double").alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", F.col("rank").cast("int").alias("rank"))
    )


def save_full_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = INDEX_BUCKETS,
) -> None:
    """Build and persist the full index layout at `path`: postings/
    (PARTITIONED BY bucket), lengths/, stats/ (1 row: n_docs, sum_dl,
    gen). The one corpus pass of the index lifecycle."""
    spark = docs.sparkSession
    save_text_index(
        build_text_index(docs, id_col, text_col, n_buckets),
        f"{path}/postings",
    )
    lengths = doc_lengths(docs, id_col, text_col)
    lengths.write.mode("overwrite").parquet(f"{path}/lengths")
    st = lengths.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    _write_stats(spark, path, int(st["n"]), int(st["s"] or 0), 0)


# -- insert commit protocol + delete lifecycle (r8) -------------------------
# Layout under the index root:
#   postings/bucket=K/   lengths/   stats/      the live index
#   tombstones/          (doc_id, dl, up_to_gen) delete markers
#   .insert_stage/       hidden staging area for one insert batch
#       postings/... lengths/...  _COMMIT (marker file)
# An insert stages its postings AND lengths hidden, writes the
# _COMMIT marker, then moves the staged files into the live dirs and
# derives stats last. Recovery (run by the WRITER entry points
# insert/delete/compact, or explicitly via text_index_recover):
# stage without marker -> roll BACK (drop the stage — nothing was
# visible); stage with marker -> roll FORWARD (finish the moves,
# re-derive stats from lengths). Either way the batch is all-visible
# or not-visible; the old append-in-place path could strand postings
# without lengths/stats forever (ADVICE r7 medium — the docstring
# claimed an atomicity the writes didn't have).
#
# Compaction commits through the SAME staged-marker protocol (review
# follow-up — the first cut wrote tombstone-corrected stats before
# deleting the tombstones, so a crash between the two permanently
# double-subtracted them): rewritten postings+lengths stage under
# .compact_stage, _COMMIT makes the compact durable, then
# _finish_compact retire-swaps the live dirs, drops the tombstones,
# and RE-DERIVES stats from the rewritten lengths (never carries
# corrected numbers) — idempotent from any crash point via
# _recover_compact. Readers stay exact in every window: while the
# tombstones exist, old stats − tombstone totals is correct over any
# mix of swapped dirs; once they are gone, open detects the _COMMIT
# marker and recomputes stats from the filtered lengths frame.
#
# Readers are SNAPSHOT-ISOLATED and NON-DESTRUCTIVE (r8 follow-up —
# the first cut ran recovery inside open_text_index, so a mere reader
# racing a live writer could delete its not-yet-committed stage, and
# a reader racing the move window could see part of a batch): open
# runs no recovery at all; instead every row carries its insertion
# generation `_gen` and the 1-row stats table (written LAST in the
# commit sequence) records the highest COMMITTED generation, so open
# filters both frames to `_gen <= stats.gen`. A mid-move batch is
# therefore invisible in full until its stats row lands, after which
# it is visible in full — single-writer/multi-reader safe with no
# locks. A batch stranded mid-move by a crash stays invisible (and
# uncounted — consistent) until the next maintenance op replays it.

_STAGE = ".insert_stage"
_CSTAGE = ".compact_stage"
_COMMIT = "_COMMIT"


def _hfs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _write_stats(
    spark: SparkSession, path: str, n_docs: int, sum_dl: int, gen: int
) -> None:
    spark.createDataFrame(
        [(int(n_docs), int(sum_dl), int(gen))],
        "n_docs long, sum_dl long, gen long",
    ).write.mode("overwrite").parquet(f"{path}/stats")


def _read_stats(spark: SparkSession, path: str) -> tuple[int, int, int]:
    row = spark.read.parquet(f"{path}/stats").collect()[0].asDict()
    # pre-r8 stats rows carry no gen column
    return int(row["n_docs"]), int(row["sum_dl"]), int(row.get("gen", 0))


def _staged_parquet_files(fs, jvm, stage: str) -> list[str]:
    """Absolute paths of every staged .parquet file (markers and
    _SUCCESS files are not data and are never moved)."""
    out = []
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(stage), True)
    while it.hasNext():
        p = it.next().getPath().toString()
        name = p.rsplit("/", 1)[1]
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            out.append(p)
    return out


def _move_staged_files(fs, jvm, stage: str, path: str) -> None:
    """THE stage-to-live move loop, shared by the live insert commit
    and crash recovery so the two protocols cannot drift (review
    follow-up): move every staged parquet file to its live twin (same
    relative path). Spark part-file names are unique, so a repeated
    recovery skips already-moved files; a FAILED rename raises — the
    stage + marker survive for the next recovery, where silently
    continuing would let the caller delete the stage over lost
    files."""
    prefix = stage.rstrip("/") + "/"
    for src in _staged_parquet_files(fs, jvm, stage):
        rel = src.split(prefix, 1)[1]
        dest = jvm.org.apache.hadoop.fs.Path(f"{path}/{rel}")
        fs.mkdirs(dest.getParent())
        if not fs.exists(dest) and not fs.rename(
            jvm.org.apache.hadoop.fs.Path(src), dest
        ):
            raise IOError(f"staged index rename failed: {src} -> {dest}")


def _stats_from_lengths(spark: SparkSession, path: str) -> None:
    """Re-derive the stats row from the live lengths dir (RAW totals;
    tombstone corrections stay open-time) — ground truth after any
    roll-forward."""
    st = (
        _with_gen(spark.read.parquet(f"{path}/lengths"))
        .agg(
            F.count("*").alias("n"),
            F.sum("dl").alias("s"),
            F.max("_gen").alias("g"),
        )
        .collect()[0]
    )
    _write_stats(
        spark, path, int(st["n"]), int(st["s"] or 0), int(st["g"] or 0)
    )


def _recover_insert(spark: SparkSession, path: str) -> None:
    """Finish or undo a crashed text_index_insert (idempotent; cost
    when there is nothing to do: one fs.exists)."""
    stage = f"{path}/{_STAGE}"
    fs, stage_p, jvm = _hfs(spark, stage)
    if not fs.exists(stage_p):
        return
    committed = fs.exists(jvm.org.apache.hadoop.fs.Path(f"{stage}/{_COMMIT}"))
    if not committed:
        fs.delete(stage_p, True)  # roll back: batch was never visible
        return
    _move_staged_files(fs, jvm, stage, path)
    _stats_from_lengths(spark, path)
    fs.delete(stage_p, True)


def _with_gen(df: DataFrame) -> DataFrame:
    """Normalize a pre-r8 frame (no `_gen` maintenance column) to
    generation 0 — without this the generation gate and the tombstone
    join would raise UNRESOLVED_COLUMN on an index persisted before
    the delete lifecycle existed (the stats-side compat branch in
    _read_stats would otherwise be dead code)."""
    if "_gen" in df.columns:
        return df
    return df.withColumn("_gen", F.lit(0).cast("long"))


def _read_tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        t = spark.read.schema(
            "doc_id long, dl long, up_to_gen long"
        ).parquet(f"{path}/tombstones")
        return t
    except Exception:  # noqa: BLE001 - no tombstones dir yet
        return None


def _apply_tombstones(
    gen_frame: DataFrame, tomb: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Hide rows whose (doc_id, _gen) is at or below a tombstone —
    a broadcast anti-join against the small marker table, composed
    under every search so membership is consistent across bm25 /
    term / phrase modes."""
    t = tomb.select(
        F.col("doc_id").alias("_t_id"), F.col("up_to_gen").alias("_t_gen")
    )
    return gen_frame.join(
        F.broadcast(t),
        (F.col(id_col) == F.col("_t_id"))
        & (F.col("_gen") <= F.col("_t_gen")),
        "left_anti",
    )


def text_index_recover(spark: SparkSession, path: str) -> None:
    """Finish (marker present) or undo (no marker) a crashed insert
    or compact — idempotent, run automatically by every writer entry
    point (insert/delete/compact); call it directly to surface a
    stranded committed batch to readers without performing another
    write."""
    _recover_compact(spark, path)
    _recover_insert(spark, path)


def open_text_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, tuple[int, int]]:
    """(postings, lengths, (n_docs, sum_dl)) for a persisted index
    root — fresh frames each call, so committed inserts and deletes
    are visible. READ-ONLY and snapshot-isolated (see the commit
    protocol block above): rows are gated to `_gen <= stats.gen`, the
    highest committed generation — a concurrent insert's mid-move
    files are invisible until its stats row (written last) lands, and
    a reader can never disturb a live writer's stage. Then the
    tombstone filter composes into both frames and the stored stats
    are corrected by the tombstoned docs' (count, dl) — BM25's N and
    avgdl track deletes without any rewrite."""
    n_docs, sum_dl, gen = _read_stats(spark, path)
    gate = F.col("_gen") <= F.lit(int(gen))
    post = _with_gen(load_text_index(spark, f"{path}/postings")).filter(gate)
    lengths = _with_gen(spark.read.parquet(f"{path}/lengths")).filter(gate)
    tomb = _read_tombstones(spark, path)
    t_agg = None
    if tomb is not None:
        t_agg = tomb.agg(
            F.count("*").alias("n"), F.sum("dl").alias("s")
        ).collect()[0]
        if int(t_agg["n"]) > 0:
            post = _apply_tombstones(post, tomb)
            lengths = _apply_tombstones(lengths, tomb)
    fs, commit_p, _jvm = _hfs(spark, f"{path}/{_CSTAGE}/{_COMMIT}")
    if fs.exists(commit_p):
        # a COMMITTED compact is mid-roll-forward (crash or live):
        # between its tombstone drop and its stats rewrite the stored
        # stats still count the dropped docs — recompute exactly from
        # the filtered lengths frame (rare path; one narrow scan).
        # The frames above are correct in every such window: swapped
        # dirs make the anti-join a no-op, unswapped dirs still need
        # it, and the generation gate passes all surviving rows.
        st = lengths.agg(
            F.count("*").alias("n"), F.sum("dl").alias("s")
        ).collect()[0]
        n_docs, sum_dl = int(st["n"]), int(st["s"] or 0)
    elif t_agg is not None and int(t_agg["n"]) > 0:
        # normal path: stored stats are raw totals; tombstone totals
        # correct them in O(tombstones)
        n_docs -= int(t_agg["n"])
        sum_dl -= int(t_agg["s"] or 0)
    return post, lengths, (n_docs, sum_dl)


def text_index_insert(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = INDEX_BUCKETS,
) -> dict:
    """O(batch) incremental maintenance for a persisted text index
    (VERDICT r5 #3 — the lifecycle parity with ivf_index_insert /
    ivfpq_index_insert): fold a document batch's postings into ONLY
    the touched term-bucket partitions, append the batch's lengths,
    and update the 1-row stats. No existing partition is rewritten —
    the staged files land inside the touched bucket=K directories and
    leave every other bucket's files untouched, so the cost is the
    batch tokenize + one batch-sized shuffle, independent of standing
    index size.

    Correctness is structural: postings rows are per-(term, doc) and
    dl is per-doc, so a batch's rows are identical whether the doc
    was indexed at build time or inserted later; df/N/avgdl are
    derived per-query from postings + stats.

    Crash atomicity (r8, ADVICE r7 medium): the batch's postings AND
    lengths stage under a hidden dir, a _COMMIT marker makes the
    batch durable, and only then do the files move into the live
    layout (stats derived last). A crash at ANY point leaves the
    index all-or-nothing after the recovery that every writer entry
    point runs automatically — never postings without lengths, and a
    retry after a pre-commit crash cannot double-count. Readers are
    snapshot-isolated throughout: open_text_index gates rows on the
    committed generation in stats, so a mid-move batch is invisible
    in full until the stats write commits it.

    Contract: new_docs' ids must not be LIVE in the index
    (re-inserting a live doc_id double-counts its postings — same
    append contract as the ANN index inserts). Re-inserting a
    DELETED id is fine: the batch's generation is above the
    tombstone's up_to_gen, so the new rows are visible immediately.

    Returns {"n_new_docs", "new_tokens", "touched_buckets"}."""
    _recover_compact(spark, path)
    _recover_insert(spark, path)
    n0, s0, gen0 = _read_stats(spark, path)
    gen = gen0 + 1
    stage = f"{path}/{_STAGE}"
    stamp = F.lit(gen).cast("long").alias("_gen")

    batch_post = build_text_index(
        new_docs, id_col, text_col, n_buckets
    ).withColumn("_gen", stamp)
    batch_post.persist()
    try:
        touched = batch_post.select("bucket").distinct().count()
        batch_post.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{stage}/postings"
        )
    finally:
        batch_post.unpersist()
    new_len = doc_lengths(new_docs, id_col, text_col).withColumn(
        "_gen", stamp
    )
    new_len.write.mode("overwrite").parquet(f"{stage}/lengths")
    st = new_len.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    n_new, s_new = int(st["n"]), int(st["s"] or 0)

    fs, _p, jvm = _hfs(spark, stage)
    fs.createNewFile(jvm.org.apache.hadoop.fs.Path(f"{stage}/{_COMMIT}"))
    _move_staged_files(fs, jvm, stage, path)
    # exact deltas, no re-derivation needed on the live path
    _write_stats(spark, path, n0 + n_new, s0 + s_new, gen)
    fs.delete(jvm.org.apache.hadoop.fs.Path(stage), True)
    return {
        "n_new_docs": n_new,
        "new_tokens": s_new,
        "touched_buckets": touched,
    }


def text_index_delete(
    spark: SparkSession, path: str, doc_ids, id_col: str = "doc_id"
) -> int:
    """Tombstone-delete documents from a persisted index (r8 — the
    lifecycle gap r6 #6 named: the index was append-only). O(deleted
    ids): appends (doc_id, dl, up_to_gen) markers; every search
    excludes marked docs via a broadcast anti-join composed at
    open_text_index time, and BM25's N/avgdl are corrected from the
    markers' own (count, dl). Ids that are not live (never indexed,
    or already deleted) append nothing, so the call is idempotent and
    stats never drift. Returns how many docs were newly tombstoned.

    Postings bytes are reclaimed by text_index_compact(); update =
    text_index_delete + text_index_insert (the re-insert's generation
    outranks the tombstone — no compaction needed for visibility)."""
    _recover_compact(spark, path)
    _recover_insert(spark, path)
    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select(F.col(id_col).cast("long").alias(id_col))
    else:
        ids = spark.createDataFrame(
            [(int(i),) for i in doc_ids], f"{id_col} long"
        )
    # live view of lengths (tombstone-filtered) -> one marker per
    # still-live requested id, carrying the dl/gen of the version
    # being removed
    lengths = _with_gen(spark.read.parquet(f"{path}/lengths"))
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        lengths = _apply_tombstones(lengths, tomb, id_col)
    marks = lengths.join(F.broadcast(ids), id_col).select(
        F.col(id_col).alias("doc_id"),
        F.col("dl").cast("long").alias("dl"),
        F.col("_gen").cast("long").alias("up_to_gen"),
    )
    marks.persist()
    try:
        n = marks.count()
        if n:
            marks.write.mode("append").parquet(f"{path}/tombstones")
    finally:
        marks.unpersist()
    return int(n)


def _finish_compact(spark: SparkSession, path: str, fs, jvm, stage) -> None:
    """Roll a COMMITTED compact forward — idempotent, so both the
    live compact and crash recovery drive the same code: swap each
    live dir whose staged twin still exists (retire-rename through
    the Hadoop FS API — the whole lifecycle works on any supported
    store, not just the local filesystem), drop the tombstones,
    re-derive stats from the rewritten lengths (ground truth), drop
    the stage LAST. Every crash prefix leaves readers consistent:
    until the tombstones vanish, old stats − tombstone totals is
    exact over any mix of swapped/unswapped dirs (a rewritten dir
    makes the anti-join a no-op, and the OLD stats still count the
    dropped docs); from tombstone-drop to stage-drop, open's
    mid-compact fallback recomputes stats from the filtered lengths
    frame directly."""
    P = jvm.org.apache.hadoop.fs.Path
    for sub in ("postings", "lengths"):
        staged = P(f"{stage}/{sub}")
        if not fs.exists(staged):
            continue  # already swapped by a previous attempt
        live = P(f"{path}/{sub}")
        retired = P(f"{path}/.{sub}_retired")
        fs.delete(retired, True)
        if fs.exists(live) and not fs.rename(live, retired):
            raise IOError(f"compact retire rename failed: {live}")
        if not fs.rename(staged, live):
            raise IOError(f"compact swap rename failed: {staged} -> {live}")
        fs.delete(retired, True)
    fs.delete(P(f"{path}/tombstones"), True)
    _stats_from_lengths(spark, path)
    fs.delete(P(str(stage)), True)


def _recover_compact(spark: SparkSession, path: str) -> None:
    """Finish or undo a crashed text_index_compact (idempotent; cost
    when there is nothing to do: one fs.exists). Same marker protocol
    as inserts: stage without _COMMIT rolls back (the live index was
    never touched), stage with _COMMIT rolls forward."""
    stage = f"{path}/{_CSTAGE}"
    fs, stage_p, jvm = _hfs(spark, stage)
    if not fs.exists(stage_p):
        return
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{stage}/{_COMMIT}")):
        fs.delete(stage_p, True)
        return
    _finish_compact(spark, path, fs, jvm, stage)


def text_index_compact(spark: SparkSession, path: str) -> dict:
    """Fold tombstones into the data: rewrite postings (keeping the
    bucket partitioning) and lengths without the deleted docs, then
    clear the markers and re-derive stats. Crash-atomic via the same
    staged-commit protocol as inserts (review follow-up — the first
    cut wrote tombstone-corrected stats BEFORE deleting the
    tombstones, so a crash between the two double-subtracted
    n_docs/sum_dl forever, and its os.rename swaps were local-FS
    only): the rewritten dirs stage under .compact_stage, a _COMMIT
    marker makes the compact durable, and _finish_compact swaps
    dirs / drops tombstones / re-derives stats from the rewritten
    lengths — every step idempotent, resumed by _recover_compact
    from any crash point, with stats always re-DERIVED (never
    carried) so no arithmetic can drift. Row _gen values are
    preserved: a crashed compact must not resurrect a tombstone's
    reach over a re-inserted doc.

    Returns {"dropped_docs", "n_docs"}; a compacted index equals a
    from-scratch rebuild on the surviving docs (pytest-asserted)."""
    _recover_compact(spark, path)
    _recover_insert(spark, path)
    tomb = _read_tombstones(spark, path)
    dropped = int(tomb.count()) if tomb is not None else 0
    post, lengths, (n_docs, sum_dl) = open_text_index(spark, path)
    if dropped == 0:
        return {"dropped_docs": 0, "n_docs": n_docs}
    stage = f"{path}/{_CSTAGE}"
    post.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{stage}/postings"
    )
    lengths.write.mode("overwrite").parquet(f"{stage}/lengths")
    fs, _sp, jvm = _hfs(spark, stage)
    fs.createNewFile(jvm.org.apache.hadoop.fs.Path(f"{stage}/{_COMMIT}"))
    _finish_compact(spark, path, fs, jvm, stage)
    return {"dropped_docs": dropped, "n_docs": int(n_docs)}


def text_index_apply_changes(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = INDEX_BUCKETS,
) -> dict:
    """Maintain a persisted text index from a CDC change batch (r6
    brief #6's last clause — the mirror's change feed drives the
    index incrementally): `changes` carries the engine envelope
    (_op/_version/_ts + id/text). The batch is thinned to its latest
    state per doc (max-version-wins, operators/cdc.latest_state —
    exactly the Mirror's apply semantics), then:
      - every touched id is tombstoned (a delete of a never-indexed
        id is a no-op by text_index_delete's contract);
      - the surviving upserts re-insert in one batch at the next
        generation, which outranks the tombstones — so an UPDATE is
        delete+insert with immediate visibility and no compaction.
    Cost: O(batch) — one tombstone append + one staged insert; run
    text_index_compact() on the same schedule as Mirror.compact() to
    reclaim postings bytes. Use from Mirror.start's foreachBatch (or
    replay a spool's batch dirs in order) to keep search membership
    converged with the mirrored table."""
    from .cdc import latest_state

    thinned = latest_state(
        changes, [id_col], keep_deletes=True
    ).persist()
    try:
        deleted = text_index_delete(
            spark, path, thinned.select(id_col), id_col
        )
        live = thinned.filter(F.col("_op") != "delete").select(
            id_col, text_col
        )
        ins = text_index_insert(
            spark, path, live, id_col, text_col, n_buckets
        )
    finally:
        thinned.unpersist()
    return {"tombstoned": deleted, **ins}


# Build-once cache behind the declared x9 query and bench: one
# persisted text index (postings PARTITIONED BY term-hash bucket +
# the narrow lengths table) per corpus directory per process — the
# same index lifecycle as ivf_index_for: build is the one corpus
# pass, every search reads its terms' bucket directories only.
_TEXT_IDX_CACHE: dict[str, str] = {}


def text_index_for(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, tuple[int, int]]:
    """(postings, lengths, (n_docs, sum_dl)) for sf_dir's documents
    table, built and persisted on first use. The stats pair is the
    persisted index statistic BM25 needs — searches read no
    corpus-sized table at all (dl rides the postings, N/avgdl ride
    here). Cache key includes the source file's mtime so regenerated
    testdata can't serve a stale index within one process."""
    import atexit
    import os
    import shutil
    import tempfile

    from ..catalog import load_table

    from ..catalog import corpus_cache_key

    key = corpus_cache_key(sf_dir, "documents.parquet")
    path = _TEXT_IDX_CACHE.get(key)
    if path is None:
        docs = load_table(spark, sf_dir, "documents")
        path = tempfile.mkdtemp(prefix="spark_graft_textidx_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        save_full_text_index(docs, path)
        _TEXT_IDX_CACHE[key] = path
    return open_text_index(spark, path)


# The lifecycle-built twin of _TEXT_IDX_CACHE: same corpus, same
# final contents, but constructed through the FULL maintenance path
# (partial build -> incremental insert -> tombstone delete ->
# CDC-envelope re-insert -> compact). x9b searches THIS index, so the
# driver's hash against the raw-corpus DuckDB oracle verifies the
# whole lifecycle, not just the one-pass build (r8 — the lifecycle
# was pytest-only; same promotion pattern as x2e_ivf_fullprobe).
_TEXT_IDX_LIFECYCLE_CACHE: dict[str, str] = {}


def text_index_lifecycle_for(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, tuple[int, int]]:
    """(postings, lengths, stats) for sf_dir's documents table, built
    through every maintenance operation and converging to EXACTLY the
    full corpus:

      1. save_full_text_index on docs with doc_id % 10 != 0 (~90%);
      2. text_index_insert of the remaining ~10% (staged commit);
      3. text_index_delete of docs with doc_id % 7 == 0 (tombstones);
      4. text_index_apply_changes re-upserting those same docs from a
         synthetic CDC envelope batch (tombstone + generation-ranked
         re-insert — the update path, visible without compaction);
      5. text_index_compact (retire-rename rewrite, markers cleared).

    Final membership, postings, lengths, and BM25 stats all equal a
    fresh one-pass build of the full corpus, so any search over this
    index must be bit-equal to the raw-corpus oracle — a wrong
    generation rank, a stats drift, a tombstone leak, or a compaction
    bug each breaks the declared x9b hash."""
    import atexit
    import shutil
    import tempfile

    from ..catalog import corpus_cache_key, load_table

    key = corpus_cache_key(sf_dir, "documents.parquet")
    path = _TEXT_IDX_LIFECYCLE_CACHE.get(key)
    if path is None:
        docs = load_table(spark, sf_dir, "documents")
        path = tempfile.mkdtemp(prefix="spark_graft_textidx_lc_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        churn = F.col("doc_id") % 7 == 0
        save_full_text_index(docs.filter(F.col("doc_id") % 10 != 0), path)
        text_index_insert(
            spark, path, docs.filter(F.col("doc_id") % 10 == 0)
        )
        text_index_delete(spark, path, docs.select("doc_id").filter(churn))
        text_index_apply_changes(
            spark,
            path,
            docs.filter(churn).select(
                F.lit("upsert").alias("_op"),
                F.lit(1).cast("long").alias("_version"),
                F.current_timestamp().alias("_ts"),
                "doc_id",
                "text",
            ),
        )
        text_index_compact(spark, path)
        _TEXT_IDX_LIFECYCLE_CACHE[key] = path
    return open_text_index(spark, path)


def text_index_build_seconds(spark: SparkSession, sf_dir: str) -> float:
    """Force (and time) the text-index builds for sf_dir — the exact
    analog of similarity.ivf_index_build_seconds (VERDICT r5 #2:
    x9_bm25_search was charging the one-time build to the timed
    search at both scales, polluting the scaled-ratio trend line).
    Covers BOTH standing indexes (the one-pass build behind x9 and
    the lifecycle-built twin behind x9b) so bench timings stay pure
    search. Returns 0.0 when both are already standing."""
    import time

    from ..catalog import corpus_cache_key

    key = corpus_cache_key(sf_dir, "documents.parquet")
    if key in _TEXT_IDX_CACHE and key in _TEXT_IDX_LIFECYCLE_CACHE:
        return 0.0
    t0 = time.perf_counter()
    text_index_for(spark, sf_dir)
    text_index_lifecycle_for(spark, sf_dir)
    return round(time.perf_counter() - t0, 3)


# Declared BM25 query (r5, VERDICT r4 #10): retrieval joins the hash
# surface. Every arithmetic step is engine-portable (see bm25_search
# determinism notes), so the DuckDB oracle replays the score exactly.
X9_TERMS = ("hash", "join", "stream")
X9_K = 15

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), post AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term IN {X9_TERMS!r} GROUP BY 1, 2
), lengths AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '')) AS BIGINT) AS dl
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM lengths
), dfq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY 1
), contrib AS (
  SELECT post.doc_id,
         CAST(FLOOR(
           (ln(((CAST(stats.n AS DOUBLE) - dfq.df) + 0.5)
               / (dfq.df + 0.5) + 1.0)
            * post.tf) * (1.2 + 1.0)
           / (post.tf + 1.2 * ((1.0 - 0.75)
              + ((0.75 * lengths.dl) / stats.avgdl)))
           * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6)) AS c
  FROM post
  JOIN dfq USING (term)
  JOIN lengths USING (doc_id)
  CROSS JOIN stats
), scored AS (
  SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score
  FROM contrib GROUP BY 1
), ranked AS (
  SELECT doc_id, score,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
              AS INT) AS rank
  FROM scored
)
SELECT doc_id, score, rank FROM ranked WHERE rank <= {X9_K}
"""


def x9_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    index, lengths, stats = text_index_for(spark, sf_dir)
    return bm25_search(
        index, lengths, list(X9_TERMS), k=X9_K, stats=stats
    )


# Declared phrase + boolean retrieval (r6, VERDICT r5 #6 follow-on:
# the slot freed by the d19+d20 merge promotes the index's OTHER two
# search modes into the hash surface). Both are deterministic —
# phrase occurrence counts and boolean match stats have no
# approximation — and replay exactly in DuckDB positional SQL.
X9B_PHRASE = "the data"
X9B_AND_TERMS = ("vector", "window")

_X9B_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS tk
  FROM documents
), pos AS (
  SELECT doc_id, unnest(tk) AS term, generate_subscripts(tk, 1) AS p
  FROM toks
), phrase AS (
  SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS v1
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  WHERE a.term = '{X9B_PHRASE.split()[0]}'
    AND b.term = '{X9B_PHRASE.split()[1]}'
  GROUP BY 1
), bool_and AS (
  SELECT doc_id,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS v1,
         CAST(COUNT(*) AS BIGINT) AS v2
  FROM pos WHERE term IN {X9B_AND_TERMS!r}
  GROUP BY doc_id
  HAVING COUNT(DISTINCT term) = {len(X9B_AND_TERMS)}
)
SELECT 'phrase' AS op, doc_id, v1, CAST(NULL AS BIGINT) AS v2
FROM phrase
UNION ALL
SELECT 'and', doc_id, v1, v2 FROM bool_and
"""


def x9b_search_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # searches the LIFECYCLE-built index (r8): membership converges to
    # the full corpus, so the raw-corpus oracle hash-verifies insert /
    # delete / generation ranking / compaction along with the searches
    index, _lengths, _stats = text_index_lifecycle_for(spark, sf_dir)
    ph = phrase_search(index, X9B_PHRASE).select(
        F.lit("phrase").alias("op"),
        "doc_id",
        F.col("n_occurrences").alias("v1"),
        F.lit(None).cast("long").alias("v2"),
    )
    bo = term_search(index, list(X9B_AND_TERMS), "and").select(
        F.lit("and").alias("op"),
        "doc_id",
        F.col("match_terms").alias("v1"),
        F.col("total_tf").alias("v2"),
    )
    return ph.unionByName(bo)


def _register() -> None:
    from ..registry import declare

    declare(
        "x9b_search_ops",
        _X9B_ORACLE,
        doc="brief/search: phrase + boolean retrieval against a "
        "PERSISTED positional index built through the FULL "
        "maintenance lifecycle (partial build -> staged insert -> "
        "tombstone delete -> CDC-envelope re-upsert -> compact) that "
        "converges to exactly the corpus — the raw-corpus oracle "
        "hash therefore verifies the whole lifecycle, op-labeled union "
        "(op='phrase': exact consecutive-phrase occurrence counts "
        "via positional algebra — term i's postings shifted by -i, "
        "one groupBy, no text re-scan; op='and': boolean "
        "all-terms retrieval with match_terms + total tf). Work = "
        "the query terms' bucket-pruned postings only; the DuckDB "
        "oracle replays both from raw positions, so the hash "
        "verifies tokenize -> postings -> positional algebra "
        "end-to-end",
    )(x9b_search_ops)

    declare(
        "x9_bm25_search",
        _BM25_ORACLE,
        doc="brief/search: BM25 top-15 for a 3-term query against the "
        "PERSISTED positional index (postings PARTITIONED BY term-hash "
        "bucket — the terms prune to their bucket directories at the "
        "scan; per-query work is the terms' postings, never a corpus "
        "scan). Scores are fixed-point-rounded per contribution and "
        "DECIMAL-summed, so the hash matches the DuckDB oracle "
        "exactly. Slot freed by merging r1_probe into "
        "r4_scalar_probes (r5).",
    )(x9_bm25_search)


_register()
