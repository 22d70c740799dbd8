"""The Mirror: snapshot + continuous change apply, natively in Spark.

Collapses the reference's 10-container pipeline (UI → flow-api →
Temporal → flow-snapshot-worker → flow-worker → MinIO staging →
ClickHouse, SURVEY §3.3; docker-compose.yml:98-238) into one API:

    m = Mirror(spark, name="mirror_orders", schema="public",
               table="orders", key_cols=["id"],
               row_schema=ORDERS_SCHEMA, target_root=..., checkpoint_root=...)
    m.snapshot(source_df)                  # O-C1 initial load
    q = m.start(changes_dir)               # O-C2/C3/C5 streaming apply
    q.awaitTermination(); m.read_target()  # converged state

Target layout is ClickHouse-ReplacingMergeTree-shaped (monitor.ps1:664
system.parts; convergence :722-763) and is the right shape at 100 TB
because apply never does read-modify-write:

    <target_root>/<schema>_<table>/base/            snapshot parquet
    <target_root>/<schema>_<table>/delta/_batch=N/  appended change parts

- foreachBatch APPENDS each micro-batch to its own delta part dir,
  overwriting that dir alone → re-running a failed batch is idempotent
  (exactly-once per batch on top of checkpointed offsets, O-C8).
- read_target() merges on read: base-as-oldest-version ∪ delta →
  max-version-wins, deletes filtered (operators.cdc.latest_state) —
  the FINAL-query analog. One shuffle on the key, the unavoidable
  minimum for keyed upsert; AQE handles key skew.
- compact() folds delta into a new base (the MergeTree background
  merge analog) so read amplification stays bounded.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import change_event_schema
from ..operators.cdc import BASE_VERSION, latest_state, target_table_name
from ..sources.changes import read_changes_stream


class Mirror:
    """One named CDC mirror for one table (README.md:85-121 create-mirror)."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        schema: str,
        table: str,
        key_cols: Sequence[str],
        row_schema: T.StructType,
        target_root: str,
        checkpoint_root: str,
        n_buckets: int = 0,
    ) -> None:
        self.spark = spark
        self.name = name
        self.key_cols = list(key_cols)
        self.row_schema = row_schema
        self.target_table = target_table_name(schema, table)
        self.target_dir = f"{target_root}/{self.target_table}"
        self.checkpoint = f"{checkpoint_root}/{name}"
        self._data_cols = [f.name for f in row_schema.fields]
        # n_buckets > 0: base/delta are dir-partitioned by a pk-hash
        # bucket, so point lookups and the merge shuffle prune to one
        # bucket's files (the SURVEY §4 pk-bucket layout)
        self.n_buckets = n_buckets

    def _bucket_col(self):
        return F.pmod(
            F.hash(*[F.col(c) for c in self.key_cols]), F.lit(self.n_buckets)
        ).alias("_bucket")

    # -- O-C1 snapshot -----------------------------------------------------
    def snapshot(self, source: DataFrame) -> None:
        """Initial full copy (flow-snapshot-worker analog). Overwrite =
        idempotent re-snapshot; goes to base/, leaving delta intact.
        Snapshot rows carry the BASE_VERSION sentinel: every change
        event (which by mirror contract postdates the snapshot point)
        beats them."""
        self._write_base(
            source.select(*self._data_cols).withColumn(
                "_version", F.lit(BASE_VERSION).cast("long")
            ),
            f"{self.target_dir}/base",
        )

    def _write_base(self, df: DataFrame, path: str) -> None:
        if self.n_buckets:
            (
                df.select("*", self._bucket_col())
                .repartition("_bucket")
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(path)
            )
        else:
            df.write.mode("overwrite").parquet(path)

    def _typed_lit(self, col: str, value):
        field = self.row_schema[col]
        return F.lit(value).cast(field.dataType)

    def bucket_of(self, **key_values) -> int:
        """The pk-hash bucket a key lives in — evaluated through Spark
        so it uses the same murmur hash, with literals cast to the
        exact column types (hash(int32) != hash(int64))."""
        expr = F.pmod(
            F.hash(*[self._typed_lit(c, key_values[c]) for c in self.key_cols]),
            F.lit(self.n_buckets),
        ).alias("b")
        return self.spark.range(1).select(expr).collect()[0]["b"]

    # -- pruned point lookup over the bucketed base ------------------------
    def lookup(self, **key_values) -> DataFrame:
        """Point lookup on the converged state. With n_buckets set, the
        base scan carries an explicit _bucket predicate, so it is
        partition-pruned to one bucket dir (PartitionFilters in the
        plan — verified by tests)."""
        cond = None
        for k, v in key_values.items():
            c = F.col(k) == self._typed_lit(k, v)
            cond = c if cond is None else cond & c
        base = self._read_base()
        if base is not None:
            if self.n_buckets:
                base = base.filter(
                    F.col("_bucket") == F.lit(self.bucket_of(**key_values))
                )
            base = base.filter(cond).select(*self._data_cols, "_version")
        delta = self._read_delta()
        if delta is not None:
            delta = delta.filter(cond)
        return self._merge(base, delta, keep_deletes=False).select(
            *self._data_cols
        )

    # -- O-C2/C3/C5/C7/C8 streaming apply ---------------------------------
    def start(
        self,
        changes_dir: str,
        available_now: bool = True,
        processing_time: str | None = None,
        max_files_per_trigger: int | None = 1,
        on_batch=None,
    ):
        """Start the named streaming apply query. availableNow drains
        the backlog then stops (test/batch-catchup mode); a
        processing_time trigger gives the reference's paced continuous
        mode (insert.ps1:13 1 s delay).

        on_batch: optional callable(batch_df, batch_id) invoked AFTER
        the delta append of each micro-batch — the composition point
        for downstream maintenance driven by the same ordered feed
        (e.g. operators.search.text_index_apply_changes keeps a text
        index's membership converged with the mirror; pinned
        end-to-end in tests/test_mirror_index.py). It runs inside
        foreachBatch, so a raised error fails the batch and the
        checkpoint replays BOTH halves — the delta re-write is
        idempotent (deterministic path, per-dir overwrite) and the
        hook must be idempotent the same way (index apply is:
        tombstone + generation-ranked re-insert converges on
        replay)."""
        stream = read_changes_stream(
            self.spark,
            changes_dir,
            change_event_schema(self.row_schema),
            max_files_per_trigger=max_files_per_trigger,
        )

        def _apply(batch, batch_id):
            self._apply_batch(batch, batch_id)
            if on_batch is not None:
                on_batch(batch, batch_id)

        writer = (
            stream.writeStream.queryName(self.name)
            .option("checkpointLocation", self.checkpoint)
            .foreachBatch(_apply)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time is not None:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch body: append this micro-batch as one delta part.
        Deterministic per-batch path + per-dir overwrite = idempotent
        replay after failure. The batch itself may contain several
        versions of a key; thin it map-side before writing (partial
        dedup — fewer delta bytes, same merge-on-read answer)."""
        thinned = latest_state(
            batch, self.key_cols, keep_deletes=True
        )
        (
            thinned.write.mode("overwrite").parquet(
                f"{self.target_dir}/delta/_batch={batch_id}"
            )
        )

    def max_version(self) -> int:
        """Highest applied _version across base + delta (two bounded
        1-row aggs) — BASE_VERSION if only the snapshot exists. The
        snapshot-diff delete sweep stamps its synthetic events at
        max_version()+1 so they beat every already-applied row under
        max-version-wins."""
        parts = []
        base = self._read_base()
        if base is not None:
            parts.append(base.select("_version"))
        delta = self._read_delta()
        if delta is not None:
            parts.append(delta.select("_version"))
        if not parts:
            return int(BASE_VERSION)
        allv = parts[0]
        for p in parts[1:]:
            allv = allv.unionByName(p)
        row = allv.agg(F.max("_version").alias("v")).collect()[0]
        return int(row["v"]) if row["v"] is not None else int(BASE_VERSION)

    # -- merged view (FINAL analog) ---------------------------------------
    def read_target(
        self,
        keep_deletes: bool = False,
        delta_paths: Sequence[str] | None = None,
    ) -> DataFrame:
        """Current converged state: base ∪ delta, max-version-wins.
        delta_paths restricts the merge to an explicit batch-dir
        snapshot (compact() uses this to avoid racing new batches)."""
        base = self._read_base()
        if base is not None:
            base = base.select(*self._data_cols, "_version")
        merged = self._merge(base, self._read_delta(delta_paths), keep_deletes)
        return merged.select(*self._data_cols)

    def _merge(
        self,
        base: DataFrame | None,
        delta: DataFrame | None,
        keep_deletes: bool,
    ) -> DataFrame:
        """base ∪ delta with max-version-wins; returns the winning rows
        WITH their _version column (callers project it away, compact()
        persists it). Base rows keep the real version they won at —
        compaction must not downgrade them to the -infinity sentinel,
        or an already-applied old batch replayed over the new base
        would regress keys to stale values."""
        empty_schema = T.StructType(
            list(self.row_schema.fields)
            + [T.StructField("_version", T.LongType())]
        )
        if base is None and delta is None:
            return self.spark.createDataFrame([], empty_schema)
        if delta is None:
            return base  # type: ignore[return-value]
        parts = delta.select("_op", "_version", "_ts", *self._data_cols)
        if base is not None:
            base_as_changes = base.select(
                F.lit("insert").alias("_op"),
                F.coalesce(
                    F.col("_version"), F.lit(BASE_VERSION)
                ).cast("long").alias("_version"),
                F.lit(None).cast("timestamp").alias("_ts"),
                *self._data_cols,
            )
            parts = base_as_changes.unionByName(parts)
        merged = latest_state(parts, self.key_cols, keep_deletes=keep_deletes)
        return merged.select(*self._data_cols, "_version")

    def resync(self, source: DataFrame) -> None:
        """Full mirror re-sync — the engine analog of the reference's
        'Reset Complete Environment' + recreate-mirror lifecycle
        (README.md:252-262) and PeerDB's resync: drop the converged
        target state AND the stream checkpoint, then re-snapshot.

        The next start() begins at batch 0 against the fresh base, so
        the change feed replays from its earliest retained offset;
        max-version-wins makes the replay converge regardless of how
        much of it predates the new snapshot. Refuses while the apply
        stream is active (same guard as compact())."""
        for q in self.spark.streams.active:
            if q.name == self.name:
                raise RuntimeError(
                    f"resync() while streaming apply {self.name!r} is "
                    "active; stop the query first"
                )
        shutil.rmtree(self.target_dir, ignore_errors=True)
        shutil.rmtree(self.checkpoint, ignore_errors=True)
        self.snapshot(source)

    def evolve(self, new_row_schema: T.StructType) -> None:
        """Schema evolution WITHOUT resync (VERDICT r4 #4): accept a
        widened row schema — every existing column keeps its name and
        type, new columns append as nullable — and keep all converged
        state and the stream checkpoint.

        Why this is enough: base/delta parquet on disk is never
        rewritten; reads go through the widened schema, so
        pre-evolution rows surface the new columns as NULL (the
        standard add-column semantics the reference's Postgres →
        ClickHouse pair would produce). The checkpoint's file offsets
        stay valid, so the next start() resumes exactly where the
        stream stopped and only new change files — which carry the new
        columns — are processed. The one restart is forced by Spark
        itself (a file source pins its schema at query start), which
        is why this refuses while the apply stream is active; the
        reference workflow (README.md:265-273 recreate-mirror) remains
        the cited behavior baseline for anything narrower than a
        superset (dropped/retyped columns still require resync)."""
        for q in self.spark.streams.active:
            if q.name == self.name:
                raise RuntimeError(
                    f"evolve() while streaming apply {self.name!r} is "
                    "active; stop the query first (the file source "
                    "pins its schema at start)"
                )
        old = {f.name: f.dataType for f in self.row_schema.fields}
        new = {f.name: f.dataType for f in new_row_schema.fields}
        dropped = [n for n in old if n not in new]
        if dropped:
            raise ValueError(
                f"schema evolution cannot drop columns {dropped}; "
                "use resync() for narrowing changes"
            )
        retyped = [
            n for n, t in old.items() if n in new and new[n] != t
        ]
        if retyped:
            raise ValueError(
                f"schema evolution cannot retype columns {retyped}; "
                "use resync() for type changes"
            )
        # Appended columns MUST be nullable (ADVICE r5): pre-evolution
        # base/delta rows surface them as NULL, so a non-null
        # declaration would lie to every downstream consumer. Coerce
        # rather than reject — the VALUES are unchanged either way and
        # nullable=True is the only truthful declaration.
        appended_nonnull = [
            f.name
            for f in new_row_schema.fields
            if f.name not in old and not f.nullable
        ]
        if appended_nonnull:
            new_row_schema = T.StructType(
                [
                    T.StructField(f.name, f.dataType, True, f.metadata)
                    if f.name in appended_nonnull
                    else f
                    for f in new_row_schema.fields
                ]
            )
        self.row_schema = new_row_schema
        self._data_cols = [f.name for f in new_row_schema.fields]

    def compact(self) -> None:
        """Fold delta into base (MergeTree background-merge analog).

        Safe against concurrent writers/readers (ADVICE r1):
        - refuses to run while this mirror's streaming apply is active
          (a delta batch landing after the merge materialized would be
          deleted even though checkpoint offsets say it was applied);
        - snapshots the set of _batch dirs FIRST and merges/deletes
          exactly those, so a batch racing in between is preserved
          (re-applying it over the new base is idempotent under
          max-version-wins);
        - swaps base via two renames instead of rmtree+move, so the
          window where a reader sees no base is microseconds, not an
          O(files) delete. Leftover batch dirs merged into the new
          base remain correct to re-read until deleted.
        """
        import glob
        import os

        for q in self.spark.streams.active:
            if q.name == self.name:
                raise RuntimeError(
                    f"compact() while streaming apply {self.name!r} is "
                    "active would drop late delta batches; stop the "
                    "query first"
                )
        batch_dirs = sorted(glob.glob(f"{self.target_dir}/delta/_batch=*"))
        base = self._read_base()
        if base is not None:
            base = base.select(*self._data_cols, "_version")
        merged = self._merge(
            base, self._read_delta(batch_dirs), keep_deletes=False
        )
        tmp = f"{self.target_dir}/base_compacting"
        # persist the winning _version per row: replaying an old delta
        # batch over the new base must stay a no-op
        self._write_base(merged, tmp)
        base = f"{self.target_dir}/base"
        retired = f"{self.target_dir}/base_retired"
        shutil.rmtree(retired, ignore_errors=True)
        if os.path.exists(base):
            os.rename(base, retired)
        os.rename(tmp, base)
        shutil.rmtree(retired, ignore_errors=True)
        for d in batch_dirs:
            shutil.rmtree(d, ignore_errors=True)

    # -- content-checksum parity (beyond-reference hardening, r5) ----------
    def checksum_parity(self, source: DataFrame) -> DataFrame:
        """One row: row-count AND content-checksum comparison between
        the source and the converged target — the monitor's count-only
        parity (monitor.ps1:743) upgraded to catch value drift that
        leaves counts equal (a corrupted apply, a missed update).

        Checksum = DECIMAL sum over rows of the portable 60-bit md5
        hash of the canonicalized row (columns joined in declared
        order, nulls marked) — order-insensitive by construction, so
        it needs no sort and distributes as one partial-agg scan per
        side. Engine-portable like every declared hash: an external
        system (e.g. the real ClickHouse side) can compute the same
        sum with its own md5."""
        from ..functions.hashing import hash64

        def side_sum(df: DataFrame, alias: str):
            canon = F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(
                        F.col(c).cast("string"), F.lit("\x00null")
                    )
                    for c in self._data_cols
                ],
            )
            return df.agg(
                F.count(F.lit(1)).alias(f"{alias}_cnt"),
                F.coalesce(
                    F.sum(hash64(canon).cast("decimal(38,0)")),
                    F.lit(0).cast("decimal(38,0)"),
                ).alias(f"{alias}_sum"),
            )

        src = side_sum(source.select(*self._data_cols), "src")
        tgt = side_sum(self.read_target(), "tgt")
        return src.crossJoin(tgt).select(
            F.lit(self.target_table).alias("table_name"),
            "src_cnt",
            "tgt_cnt",
            (
                (F.col("src_cnt") == F.col("tgt_cnt"))
                & (F.col("src_sum") == F.col("tgt_sum"))
            ).alias("in_sync"),
            F.col("src_sum").cast("string").alias("src_checksum"),
            F.col("tgt_sum").cast("string").alias("tgt_checksum"),
        )

    # -- O-D1 parity (monitor.ps1:743) -------------------------------------
    def parity(self, source: DataFrame) -> DataFrame:
        src = source.agg(F.count(F.lit(1)).alias("src_cnt"))
        tgt = self.read_target().agg(F.count(F.lit(1)).alias("tgt_cnt"))
        return (
            src.crossJoin(tgt)
            .select(
                F.lit(self.target_table).alias("table_name"),
                "src_cnt",
                "tgt_cnt",
                (F.col("src_cnt") - F.col("tgt_cnt")).alias("lag"),
            )
        )

    def _read_base(self) -> DataFrame | None:
        fields = list(self.row_schema.fields) + [
            # per-row winning version (BASE_VERSION for snapshot rows;
            # missing in pre-upgrade bases -> read as null, coalesced
            # to the sentinel at merge time)
            T.StructField("_version", T.LongType())
        ]
        if self.n_buckets:
            fields.append(T.StructField("_bucket", T.IntegerType()))
        try:
            return self.spark.read.schema(T.StructType(fields)).parquet(
                f"{self.target_dir}/base"
            )
        except Exception:
            return None

    def _read_delta(
        self, paths: Sequence[str] | None = None
    ) -> DataFrame | None:
        targets = (
            list(paths)
            if paths is not None
            else [f"{self.target_dir}/delta/_batch=*"]
        )
        if not targets:
            return None
        if paths is not None:
            # Explicit paths come from compact(), which deletes these
            # dirs right after the merged base lands. Swallowing a
            # transient read error here would compact WITHOUT the delta
            # and then destroy it — let it propagate instead.
            return self.spark.read.schema(
                change_event_schema(self.row_schema)
            ).parquet(*targets)
        try:
            # Glob probe: no delta dir yet is an expected state.
            return self.spark.read.schema(
                change_event_schema(self.row_schema)
            ).parquet(*targets)
        except Exception:
            return None


class MirrorSet:
    """Multi-table mirror (README.md:120: table selection in one
    mirror; the reference replicates customers/products/orders
    together). One Mirror per table, shared warehouse/checkpoint
    roots, combined parity report — the monitor's per-table flow
    analysis (monitor.ps1:703-794)."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        schema: str,
        tables: dict[str, tuple[Sequence[str], T.StructType]],
        target_root: str,
        checkpoint_root: str,
        n_buckets: int = 0,
    ) -> None:
        self.mirrors = {
            table: Mirror(
                spark,
                name=f"{name}_{table}",
                schema=schema,
                table=table,
                key_cols=key_cols,
                row_schema=row_schema,
                target_root=target_root,
                checkpoint_root=checkpoint_root,
                n_buckets=n_buckets,
            )
            for table, (key_cols, row_schema) in tables.items()
        }

    def snapshot_all(self, sources: dict[str, DataFrame]) -> None:
        for table, df in sources.items():
            self.mirrors[table].snapshot(df)

    def start_all(self, changes_dirs: dict[str, str], **kw) -> list:
        return [
            self.mirrors[t].start(d, **kw) for t, d in changes_dirs.items()
        ]

    def parity_report(self, sources: dict[str, DataFrame]) -> DataFrame:
        """Per-table lag + classification (monitor.ps1:743-755)."""
        out = None
        for table, src in sources.items():
            p = self.mirrors[table].parity(src)
            out = p if out is None else out.unionByName(p)
        assert out is not None
        return out.select(
            "*",
            F.when(F.col("lag") == 0, "SYNCED")
            .when(F.abs("lag") <= 5, "NEAR_SYNC")
            .otherwise("LAG")
            .alias("status"),
        )


# -- O-C9 stream status introspection (README.md:238-241; monitor §4) ------

STATUS_SCHEMA = T.StructType(
    [
        T.StructField("slot_name", T.StringType()),
        T.StructField("query_id", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("last_batch_id", T.LongType()),
        T.StructField("input_rows", T.LongType()),
        T.StructField("batches_seen", T.LongType()),
        # stateful-operator observability (ClickHouse system.metrics /
        # pg_stat_replication analog): current state-store rows and
        # rows discarded as too-late across the query's progress
        T.StructField("state_rows", T.LongType()),
        T.StructField("late_rows_dropped", T.LongType()),
    ]
)


def stream_status(spark: SparkSession, queries=None) -> DataFrame:
    """pg_replication_slots analog (README.md:240, O-R14/O-C9): one row
    per streaming query with its durable progress. Pass explicit query
    handles to include finished (drained availableNow) queries."""
    qs = list(queries) if queries is not None else list(spark.streams.active)
    rows = []
    for q in qs:
        prog = q.recentProgress
        last = prog[-1] if prog else None
        state_rows = sum(
            int(op.get("numRowsTotal", 0))
            for op in (last or {}).get("stateOperators", [])
        )
        late = sum(
            int(op.get("numRowsDroppedByWatermark", 0))
            for p in prog
            for op in p.get("stateOperators", [])
        )
        rows.append(
            (
                q.name,
                str(q.id),
                q.isActive,
                int(last["batchId"]) if last else -1,
                int(sum(p["numInputRows"] for p in prog)),
                len(prog),
                int(state_rows),
                int(late),
            )
        )
    from ..functions.values import values_frame

    return values_frame(spark, rows, STATUS_SCHEMA)


# -- O-C10 watermarked windowed aggregation over the change stream ---------

def windowed_op_counts(
    stream: DataFrame,
    ts_col: str = "_ts",
    watermark: str = "10 seconds",
    window: str = "1 minute",
) -> DataFrame:
    """Late-data-tolerant per-op throughput over event time — the
    streaming carrier for the monitor's lag/catch-up analytics
    (peerdb_config.yaml:36-37). Watermark bounds state (SURVEY §4 WAL
    bound analog)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("_op"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "_op", "cnt")
    )
