"""PySpark-native analytics engine with the query & data-processing
capabilities of khoirulamars/peerdb-cdc-psql-clickhouse.

The reference is a CDC orchestration/test-harness repo (PeerDB stack:
PostgreSQL -> ClickHouse). This package re-expresses its entire surface
Spark-first:

- relational ops the reference issues as SQL         -> operators.relational
- client-side (PowerShell) dataflow analytics        -> operators.metrics
- CDC snapshot/apply/dedup semantics                 -> operators.cdc
- structured-streaming mirror (Temporal/flow-worker) -> streaming.mirror
- LLM-data-pipeline extensions (dedup, similarity,
  text analysis, multimodal)                         -> operators.{dedup,similarity,text,multimodal}

Design constraints (100 TB discipline):
- DataFrame/SQL only, never RDD; no driver-side collect in operators.
- Catalyst does pushdown/pruning/join planning; broadcast small dims.
- Deterministic results: max-version-wins for CDC, explicit aliases &
  decimal casts so results hash-match a DuckDB oracle.
"""

__version__ = "0.1.0"
