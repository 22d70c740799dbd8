"""Scale probe: run the heavy operators on Nx self-unioned copies of
the sf0.1 tables (ids offset per copy so keys stay distinct) and
report wall time per scale. Linear-or-better growth here is the
evidence that the operator graphs (row-local signatures, band/bucket
equi-joins, single-shuffle apply) hold as data grows — the knob that
matters at 100 TB, where parallelism comes from file splits instead
of the fan_out rebalance used on this single-file testdata.

Usage: python scripts/scale_probe.py [multipliers...]   (default 1 4 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
from peerdb_cdc_psql_clickhouse_spark.operators.cdc import latest_state
from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
    simhash,
)
from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
    cosine_neardup_pairs,
)
from peerdb_cdc_psql_clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(
    df: DataFrame,
    id_col: str,
    n: int,
    id_stride: int,
    text_col: str | None = None,
    emb_col: str | None = None,
) -> DataFrame:
    """N stacked copies with per-copy distinct ids. Content columns
    are made copy-distinct too (text: bijective char rotation;
    embeddings: cyclic coordinate shift — an orthogonal permutation,
    so within-copy cosines are EXACTLY preserved while cross-copy
    cosine of random vectors ~ 0) so the Nx corpus has Nx the DATA at
    the same duplicate RATE — without this, dedup-family probes
    measure quadratic growth in duplicate multiplicity, not the
    operator's scaling (the bench.materialize_scaled lesson; a mere
    1%-coordinate rescale left replicas at cos >= 0.9996, still
    planted near-dups)."""
    from bench import MAX_SCALE_MULT, _rot_text, _shift_embedding

    if text_col is not None and n > MAX_SCALE_MULT:
        raise ValueError(
            f"n={n} exceeds {MAX_SCALE_MULT}: text rotation cycles to "
            "identity and replicas regain verbatim duplicates"
        )
    out = df
    for i in range(1, n):
        c = df.withColumn(id_col, F.col(id_col) + i * id_stride)
        if text_col is not None:
            c = c.withColumn(text_col, _rot_text(F.col(text_col), i))
        if emb_col is not None:
            c = c.withColumn(emb_col, _shift_embedding(F.col(emb_col), i))
        out = out.unionByName(c)
    return out


def probe(spark, mult: int) -> dict[str, float]:
    docs = replicate(
        load_table(spark, SF_DIR, "documents"),
        "doc_id",
        mult,
        10_000_000,
        text_col="text",
    )
    emb = replicate(
        load_table(spark, SF_DIR, "embeddings"),
        "vec_id",
        mult,
        10_000_000,
        emb_col="embedding",
    )
    ev = load_table(spark, SF_DIR, "events")
    changes = replicate(
        ev.select(
            (F.col("event_id") % 257).alias("entity_id"),
            F.lit("update").alias("_op"),
            F.col("event_id").alias("_version"),
            F.col("ts").alias("_ts"),
            F.col("value"),
        ),
        "_version",
        mult,
        10_000_000,
    )
    from peerdb_cdc_psql_clickhouse_spark.operators.asof import (
        asof_join,
        range_join_count,
    )
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        dup_clusters,
        winnow_edges,
    )
    from peerdb_cdc_psql_clickhouse_spark.operators.text import winnow_fp
    from peerdb_cdc_psql_clickhouse_spark.plans.layout import fan_out

    # events table is not replicated by id (asof/range scale with
    # events x mult via per-key density): stack copies at shifted keys
    evm = replicate(
        ev.select("event_id", "ts", "user_id", "event_type"),
        "event_id", mult, 100_000_000,
    ).withColumn("user_id", F.col("user_id") + (F.col("event_id") / 100_000_000).cast("long") * 1_000_000)
    err = evm.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    non_err = (
        evm.filter(F.col("event_type") != "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("prior_id"))
    )
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        ann_topk_ivf_prerank,
        semantic_neardup_against,
        semantic_neardup_pairs,
    )

    # r4 hot-path probes: plant adversarial mass that GROWS with mult,
    # so the occupancy-capped paths are exercised at every scale —
    # linear growth here is the evidence the caps bound the work.
    base_vec = [
        float(x)
        for x in load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    mass = spark.range(500 * mult).select(
        (F.col("id") + 50_000_000).alias("vec_id"),
        F.transform(
            F.array(*[F.lit(x) for x in base_vec]),
            lambda x, i: F.when(
                i == 0, x * (F.lit(1.0) + F.col("id") / F.lit(1e7))
            ).otherwise(x),
        ).alias("embedding"),
    )
    emb_hot = emb.select("vec_id", "embedding").unionByName(mass)
    boiler = " ".join(f"bp{j}" for j in range(40))
    hot_docs = docs.select("doc_id", "text").unionByName(
        spark.range(300 * mult).select(
            (F.col("id") + 50_000_000).alias("doc_id"),
            F.concat(
                F.lit("hdr"), F.col("id").cast("string"),
                F.lit(" filler words "), F.lit(boiler),
            ).alias("text"),
        )
    )
    qids = emb.select("vec_id").filter(F.col("vec_id") < 50)
    seeds = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < 64)
        .select(
            F.col("vec_id").alias("c_id"),
            F.col("embedding").alias("c_vec"),
        )
    )
    jobs = {
        "minhash_lsh": lambda: lsh_candidate_pairs(
            minhash_signature(docs, "doc_id", "text"), "doc_id"
        ),
        "simhash": lambda: simhash(docs, "doc_id", "text"),
        "cosine_neardup": lambda: cosine_neardup_pairs(emb),
        "cdc_apply": lambda: latest_state(changes, ["entity_id"]),
        "asof_join": lambda: asof_join(
            err, non_err, key="user_id", left_ts="ts", right_ts="ts",
            payload=["prior_id"],
        ),
        "range_join": lambda: range_join_count(
            err, evm.select("user_id", "ts"), key="user_id",
            left_ts="ts", right_ts="ts", window_s=300, count_alias="n",
        ),
        "dup_clusters": lambda: dup_clusters(
            winnow_edges(winnow_fp(fan_out(docs)))
        ),
        "dup_clusters_star": lambda: __import__(
            "peerdb_cdc_psql_clickhouse_spark.operators.dedup",
            fromlist=["dup_clusters_star"],
        ).dup_clusters_star(winnow_edges(winnow_fp(fan_out(docs)))),
        "substring_spans": lambda: __import__(
            "peerdb_cdc_psql_clickhouse_spark.operators.dedup",
            fromlist=["substring_spans"],
        ).substring_spans(docs),
        "semantic_neardup": lambda: __import__(
            "peerdb_cdc_psql_clickhouse_spark.operators.similarity",
            fromlist=["semantic_neardup_pairs"],
        ).semantic_neardup_pairs(emb, n_centroids=16 * mult),
        "shuffle_corpus": lambda: __import__(
            "peerdb_cdc_psql_clickhouse_spark.operators.pipeline",
            fromlist=["shuffle_corpus"],
        ).shuffle_corpus(docs),
        # r4: mult x 500 near-identical vectors land in one k-means
        # cell; the occupancy cap must keep pair work O(mass) (star),
        # not O(mass^2)
        "semantic_hotmass_capped": lambda: semantic_neardup_pairs(
            emb_hot, n_centroids=16 * mult, max_cluster_size=256
        ),
        # r4: boilerplate block in mult x 300 docs is over occ_cap at
        # every mult — the canonical-star hot-shingle path
        "substring_hot": lambda: __import__(
            "peerdb_cdc_psql_clickhouse_spark.operators.dedup",
            fromlist=["substring_spans"],
        ).substring_spans(hot_docs),
        # r4: JL pre-rank search — fixed query set, growing corpus
        "ivf_prerank": lambda: ann_topk_ivf_prerank(
            emb.select("vec_id", "embedding"), qids
        ),
        # r4: incremental screen — fixed 500-row batch vs mult x
        # history (recomputes the history assignment each run; against
        # the production-persisted table only the join remains)
        "semantic_screen_500batch": lambda: semantic_neardup_against(
            mass.limit(500),
            seeds,
            __import__(
                "peerdb_cdc_psql_clickhouse_spark.operators.similarity",
                fromlist=["ivf_assign"],
            ).ivf_assign(emb.select("vec_id", "embedding"), seeds, 1)
            .select("centroid_id", "vec_id", "embedding"),
        ),
    }
    res = {}
    for name, build in jobs.items():
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        res[name] = round(time.perf_counter() - t0, 2)
    return res


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for m in mults:
        out[m] = probe(spark, m)
        print(json.dumps({"mult": m, **out[m]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
