"""SparkSession factory with scale-oriented defaults.

Tuned for local[$SPARK_GRAFT_CPUS] testing but with settings that
carry to a 1000-executor cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), sane shuffle partition count,
Arrow enabled for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "peerdb-cdc-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    import tempfile

    active = SparkSession.getActiveSession()
    if active is not None:
        # Most configs below only apply to a NEW JVM, but
        # spark.sql.shuffle.partitions is runtime-modifiable: honor an
        # EXPLICIT caller request instead of silently returning a
        # session pinned at some other parallelism (ADVICE r5).
        if shuffle_partitions is not None:
            active.conf.set(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    # Per-process scratch for the Derby metastore + SQL warehouse
    # (VERDICT r4 #6): two concurrently-launched local JVMs sharing
    # cwd's derby.log/metastore_db/spark-warehouse race on Derby's
    # single-process lock — the intermittent suite-launch collision.
    # A unique dir per process removes the shared state entirely (and
    # keeps the repo clean of derby droppings). No effect on an
    # existing JVM: getOrCreate reuses the running session.
    scratch = tempfile.mkdtemp(prefix=f"spark_graft_{os.getpid()}_")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r18 opt (guide §3.1): let AQE rewrite sort-merge joins to
        # shuffled-hash at runtime when EVERY post-shuffle partition
        # is under this bound — skips both sort passes with a
        # per-partition hash build bounded at any scale (the bound is
        # measured partition bytes, not a size estimate, so the x1d
        # broadcast-OOM class of failure cannot recur here).
        # Alternating A/B at sf0.1: -4% on the join-heavy queries
        # (x1g 2.40->2.25, x3h 2.16->2.05), no regressions.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", f"{scratch}/warehouse")
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={scratch}/derby",
        )
    )
    return builder.getOrCreate()
