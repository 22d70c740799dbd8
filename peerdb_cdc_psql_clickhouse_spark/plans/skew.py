"""Skew mitigation for keyed joins.

At 100 TB a handful of hot keys (a viral user, a default/null id, a
dominant tenant) can put one shuffle partition orders of magnitude
above the rest. First-line defenses are free: AQE skew-join splitting
(enabled in session.get_spark) and broadcasting small dimensions. This
module covers the remaining case — a skewed equi-join whose build side
is too big to broadcast and where AQE can't help (e.g. inside
Structured Streaming, where AQE is disabled).

salted_join replicates each build-side row `salts` times and scatters
the probe side uniformly across the replicas, so a hot key's rows
spread over `salts` shuffle partitions instead of one. Cost:
build-side rows x salts — choose the smaller side as `other` and keep
salts modest (8-32). The salt is a deterministic hash of the probe
row, not rand(), so results are reproducible and retries/speculative
tasks see stable data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed` (large, hot-keyed probe side) with `other`
    (build side, replicated) on column `on`, spreading each key across
    `salts` partitions.

    Only inner/left (probe-side-preserving) joins are supported: under
    right/full outer, every UNMATCHED build-side row would surface
    once per salt replica (`salts` duplicates), because replication
    is only cancelled by the join for matched rows (ADVICE r1).
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "semi",
                   "leftsemi", "left_semi", "anti", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join supports probe-side-preserving joins only, "
            f"not how={how!r}: unmatched build rows would be emitted "
            f"once per salt replica"
        )
    if SALT_COL in skewed.columns or SALT_COL in other.columns:
        raise ValueError(f"{SALT_COL!r} column already present")
    probe = skewed.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salts)
        ).cast("int"),
    )
    build = other.withColumn(
        SALT_COL,
        F.explode(
            F.sequence(F.lit(0), F.lit(salts - 1))
        ),
    )
    return probe.join(build, [on, SALT_COL], how).drop(SALT_COL)
