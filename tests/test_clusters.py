"""dup_clusters: min-label propagation connected components on
hand-built graphs — chains (transitivity), separate components, and
convergence before the iteration cap."""

from __future__ import annotations

from peerdb_cdc_psql_clickhouse_spark.operators.dedup import dup_clusters


def _clusters(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(df, **kw).collect()
    }


def test_chain_is_one_component(spark):
    # 1-2-3-4-5 chain: diameter 4, label 1 must reach node 5
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_separate_components_keep_separate_labels(spark):
    got = _clusters(spark, [(1, 2), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_label_flows_against_edge_direction(spark):
    # min id on the dst side: propagation must be symmetric
    got = _clusters(spark, [(5, 1), (5, 9)])
    assert got == {1: 1, 5: 1, 9: 1}


def test_iteration_cap_respected(spark):
    # with max_iters=1 a long chain cannot fully converge, but labels
    # must still be a valid partial propagation (never invent labels)
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4)], max_iters=1)
    assert set(got) == {1, 2, 3, 4}
    assert all(lbl in {1, 2, 3, 4} and lbl <= n for n, lbl in got.items())
