"""Physical-plan quality gates (SURVEY §4; the 100 TB discipline).

Each assertion encodes a plan property that must survive refactors:
pushdown reaching the parquet scan, column pruning, broadcast joins
for dims, map-side window pruning for CDC apply, and the absence of
cartesian products in the near-dup family. A failure here means a
change made the plan worse even if results are still correct.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from peerdb_cdc_psql_clickhouse_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    qs = all_queries()

    def get(name: str) -> str:
        df = qs[name].build(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    return get


def test_projection_scan_prunes_columns(plans):
    # O-R2: the merged projection+distinct query still reads exactly
    # one column off the parquet scan
    p = plans("r2_projection_distinct")
    assert "ReadSchema: struct<o_custkey:bigint>" in p


def test_filtered_sum_prunes_columns(plans):
    # O-R7 (merged into r4_scalar_probes as a conditional sum sharing
    # the lineitem scan): only referenced columns are read
    p = plans("r4_scalar_probes")
    assert (
        "l_extendedprice" in p
        and "l_comment" not in p
        and "l_shipdate" not in p
    )


def test_filter_pushed_to_parquet(plans):
    # pushdown discipline asserted on the error_top3 branch of the
    # merged d19_monitor_ops union (filter + ordered limit)
    p = plans("d19_monitor_ops")
    assert "EqualTo(event_type,error)" in p  # predicate reached the scan


def test_dim_joins_broadcast(plans):
    for q in ("r8_cross_join_group", "r13_seed_join"):
        p = plans(q)
        assert "BroadcastHashJoin" in p, q
        assert "CartesianProduct" not in p, q


def test_ngram_jaccard_never_broadcasts_corpus_sized_sides(plans):
    """r18, found by the 50x extended leg: x1d's `sizes` frames are
    O(corpus) (one row per doc); at 50x their ~60 MB serialized
    estimate slid under the 64 MB broadcast threshold and the
    driver-side build OOMed. The joins are hinted shuffle_hash — no
    broadcast may appear anywhere in the x1d plan, at any scale."""
    p = plans("x1d_ngram_jaccard")
    assert "BroadcastHashJoin" not in p
    assert "ShuffledHashJoin" in p


def test_cdc_apply_single_shuffle_with_group_limit(plans):
    p = plans("c4_cdc_apply_latest")
    # exactly one exchange (hash on entity_id) for the keyed dedup
    assert p.count("(\n") == 0  # formatted output sanity
    exchanges = [l for l in p.splitlines() if l.strip().startswith("Exchange")]
    assert len(exchanges) <= 2  # data exchange (+AQE read); no extra
    # WindowGroupLimit = rank-limit pushdown thins versions map-side
    assert "WindowGroupLimit" in p


def test_minhash_has_no_cartesian_and_no_groupby_shuffle(plans):
    p = plans("x1b_minhash_lsh")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # signature is row-local now: no hashpartitioning on doc_id before
    # the band join (only the band-key join + dedup shuffles remain)
    assert "Generate explode" not in p or "hashpartitioning(doc_id" not in p


def test_lsh_band_join_shuffle_is_narrow(spark):
    """VERDICT r1 #8: the exploded band self-join must shuffle only
    (id, band_idx, band_key) — signature columns re-attach to the
    deduplicated pair set afterwards. The exploded relation is bands x
    corpus rows, so a sig column riding it costs `bands` copies per
    side."""
    import contextlib
    import io

    from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    docs = load_table(spark, SF, "documents")
    sig = minhash_signature(docs, "doc_id", "text")
    pairs = lsh_candidate_pairs(sig, "doc_id")
    # force the at-scale plan shape: at 100 TB the band self-join is a
    # shuffle join, not a broadcast (tiny sf would broadcast it)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            pairs.explain("formatted")
        p = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    band_exchanges = [
        l
        for l in p.splitlines()
        if "hashpartitioning(band_idx" in l
    ]
    assert band_exchanges, "band join no longer keyed on band columns?"
    assert all("sig_" not in l for l in band_exchanges), (
        "signature columns are riding the exploded band-join shuffle"
    )


def test_simhash_is_map_only(plans):
    p = plans("x1c_simhash")
    # row-local rewrite: no aggregate exchange at all; the only
    # exchange is the explicit fan_out round-robin
    exchanges = [
        l for l in p.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert not exchanges


def test_cosine_topk_broadcasts_queries(plans):
    p = plans("x2_cosine_topk")
    assert "BroadcastNestedLoopJoin" in p  # tiny query set x corpus
    assert "WindowGroupLimit" in p  # top-k pruned map-side


def test_neardup_joins_on_bucket(plans):
    p = plans("x2c_cosine_neardup")
    assert "CartesianProduct" not in p


def test_mirror_read_target_thins_versions_map_side(spark, tmp_path):
    """Merge-on-read (the FINAL analog) must carry the WindowGroupLimit
    rank-limit pushdown: version thinning happens map-side BEFORE the
    key exchange, so the merge shuffle moves ~1 row per key, not every
    retained version."""
    import contextlib
    import io

    from pyspark.sql import types as T

    from peerdb_cdc_psql_clickhouse_spark.streaming.mirror import Mirror
    from peerdb_cdc_psql_clickhouse_spark.sources.changes import (
        write_change_batches,
    )
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("val", T.StringType()),
        ]
    )
    m = Mirror(
        spark,
        name="plan_gate_mirror",
        schema="public",
        table="pg",
        key_cols=["id"],
        row_schema=schema,
        target_root=str(tmp_path / "wh"),
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    m.snapshot(spark.createDataFrame([(1, "a")], schema))
    ev = T.StructType(
        [
            T.StructField("_op", T.StringType()),
            T.StructField("_version", T.LongType()),
            T.StructField("_ts", T.TimestampType()),
        ]
        + list(schema.fields)
    )
    t = dt.datetime(2026, 1, 1)
    write_change_batches(
        spark.createDataFrame([("update", 1, t, 1, "b")], ev),
        str(tmp_path / "feed"),
        1,
    )
    m.start(str(tmp_path / "feed"), available_now=True).awaitTermination(60)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        m.read_target().explain("formatted")
    p = buf.getvalue()
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_fan_out_noop_on_multisplit_input(spark):
    """VERDICT r1 #4: fan_out must NOT shuffle an input that already
    has >= target-parallelism partitions (at 100 TB that would
    round-robin the raw corpus and could reduce parallelism to
    core-count). Single-split inputs still get rebalanced."""
    from peerdb_cdc_psql_clickhouse_spark.plans.layout import fan_out

    wide = spark.range(0, 1000, 1, numPartitions=16)
    assert fan_out(wide, parallelism=8) is wide  # pass-through, no Exchange

    narrow = spark.range(0, 1000, 1, numPartitions=1)
    assert fan_out(narrow, parallelism=8).rdd.getNumPartitions() == 8


def test_reuse_materialized_matches_persist(spark):
    """The write-once-parquet variant of reuse() must flow through the
    cluster pipeline unchanged: winnow fingerprints -> edges ->
    connected components give identical clusters either way."""
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        dup_clusters,
        winnow_edges,
    )
    from peerdb_cdc_psql_clickhouse_spark.operators.text import winnow_fp
    from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
    from peerdb_cdc_psql_clickhouse_spark.plans import layout

    docs = load_table(spark, SF, "documents")
    fp = winnow_fp(docs)

    via_persist = sorted(
        dup_clusters(winnow_edges(fp)).collect(),
        key=lambda r: r.doc_id,
    )
    mat = layout.reuse(fp, materialize=True)
    via_parquet = sorted(
        dup_clusters(winnow_edges(mat)).collect(),
        key=lambda r: r.doc_id,
    )
    assert via_persist == via_parquet
    assert len(via_persist) > 0


def test_declared_ann_search_prunes_index_partitions(plans):
    # r5/r6: the declared ANN union searches the PERSISTED IVF index
    # — both branches' physical plans must show the probed cells
    # pruning at the parquet scan via the partition column, not a
    # full-lists scan
    p = plans("x2b_ann_searches")
    assert "PartitionFilters" in p and "centroid_id" in p


def test_declared_phrase_boolean_prunes_postings_buckets(plans):
    # r6: x9b's phrase + boolean branches both search the persisted
    # positional index — bucket partition filters must reach the scan
    p = plans("x9b_search_ops")
    assert "PartitionFilters" in p and "bucket" in p
    assert "term" in p


def test_d16_head_tail_is_distributed_topk(plans):
    """VERDICT r11 #1: the head/tail branch must be two distributed
    top-k limits (TakeOrderedAndProject: each partition keeps a local
    5, only 5 rows/partition move), NOT two unpartitioned row_number
    windows = two single-partition sorts of the full events table."""
    p = plans("d16_rank_ops")
    # latest-file (limit 1) + head (limit 5) + tail (limit 5)
    assert p.count("TakeOrderedAndProject") >= 3
    # nothing in this plan may funnel the events table through one
    # task; the only Window left is first_seen's, keyed on user_id
    assert "SinglePartition" not in p
    assert "hashpartitioning(user_id" in p


def test_x9_final_topk_not_global_window(plans):
    """VERDICT r11 #2: the BM25 final ranking must be orderBy+limit
    (TakeOrderedAndProject — distributed partial top-k) with the rank
    window running over the <=k-row result, NOT a row_number over an
    unpartitioned window across every doc matching any query term
    (one hot term at 100 TB = millions of rows through one task)."""
    p = plans("x9_bm25_search")
    assert "TakeOrderedAndProject" in p
    assert "SinglePartition" not in p


def test_d5_ntile_is_bucketed_global_rank(plans):
    """VERDICT r11 #3: the thirds-trend tile assignment must ride the
    distributed global_rank (range bucket + local rank + offset join
    — the shuffle_corpus pattern), not a corpus-wide unpartitioned
    ntile window."""
    p = plans("d5_run_summary")
    assert "ntile" not in p
    # the rank window is keyed on the value-range bucket
    assert "windowspecdefinition(_gr_bkt" in p
    assert "hashpartitioning(_gr_bkt" in p
    # exactly four bounded SinglePartition steps are allowed: the
    # final 1-row global aggregate (one partial buffer per partition),
    # r13's in-plan offsets cumsum (input = the POST-aggregation
    # per-bucket counts frame, <= shuffle-partitions rows by the
    # bucket clamp), and the 1-row bounds aggregate that global_rank
    # broadcasts to its two consumers (ranking + counts legs; listed
    # twice at explain time, reused at runtime). Anything beyond
    # these means a corpus-sized single-partition step crept back in.
    assert p.count("SinglePartition") <= 4


def test_declared_bm25_prunes_postings_buckets(plans):
    # r5: x9 searches the persisted positional index — the query
    # terms' bucket ids must reach the scan as partition filters and
    # the term predicate must be pushed to parquet
    p = plans("x9_bm25_search")
    assert "PartitionFilters" in p and "bucket" in p
    assert "term" in p


def test_substring_spans_shares_shingle_frame(plans):
    """r12: the shingle derivation (tokenize + k-gram + md5) feeds four
    non-identical subtrees — without reuse() Catalyst re-tokenizes the
    corpus four times (measured as the worst scaled ratio). The plan
    must read the shared persisted frame."""
    p = plans("x1g_substring_spans")
    assert "InMemoryTableScan" in p or "InMemoryRelation" in p


def test_d5_single_partition_exchanges_are_aggregate_bounded(spark):
    """ADVICE r13 (low): the formatted-text `SinglePartition <= 4`
    count above keys off explain FORMATTING — a Spark minor-version
    rename would flip it without a real regression, and a regression
    that renames the node would pass. This anchors the invariant to
    the plan TREE: every ShuffleExchangeExec whose output partitioning
    is SinglePartition must have an Aggregate in its child subtree —
    the rows entering the single partition are post-aggregation (one
    per group: the 1-row bounds/global aggregates and the <=n_parts
    counts frame), bounded by construction — so a corpus-sized
    single-partition step cannot hide behind a formatting change."""
    qs = all_queries()
    df = qs["d5_run_summary"].build(spark, SF)
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.initialPlan()  # exchanges pre-AQE, pre-execution

    def walk(node):
        yield node
        kids = node.children()
        for i in range(kids.length()):
            yield from walk(kids.apply(i))

    single = [
        n
        for n in walk(plan)
        if n.getClass().getSimpleName() == "ShuffleExchangeExec"
        and "SinglePartition" in n.outputPartitioning().toString()
    ]
    # the gate must be exercised: d5's global_rank carries at least
    # the bounds aggregate and the offsets-cumsum exchange
    assert 1 <= len(single) <= 4
    for exch in single:
        assert any(
            "Aggregate" in n.getClass().getSimpleName()
            for n in walk(exch)
        ), (
            "SinglePartition exchange without an aggregate-bounded "
            f"child subtree:\n{exch.treeString()}"
        )


def test_dedup_apply_and_select_join_persisted_cluster_table(plans):
    """r14: x1f/x7 join the per-corpus persisted cluster table; a
    regression back to in-query label propagation would re-introduce
    localCheckpoint scans (ExistingRDD leaves) and per-execution
    iterative rounds. The consumers' plans must be pure parquet-scan
    dataflows; x1e — the declared live construction query — still
    legitimately carries the checkpointed iteration."""
    for name in ("x1f_dedup_apply", "x7_corpus_select"):
        p = plans(name)
        assert "Scan ExistingRDD" not in p, name
        assert "Scan parquet" in p, name
    # and the construction query keeps its honest iterative shape
    assert "Scan ExistingRDD" in plans("x1e_dup_clusters")
