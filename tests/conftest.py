from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from peerdb_cdc_psql_clickhouse_spark.session import get_spark

    s = get_spark("pytest", shuffle_partitions=8)
    yield s
    s.stop()


def stagger_mtimes(*dirs: str) -> None:
    """Force strictly-ascending modification times across file dirs.

    Streaming tests that stage 'file 1 then watermark-pusher file 2'
    rely on the FileStreamSource processing f=1 before f=2 — but the
    source orders files by modification time, and two writes landing
    in the same clock tick tie, making the order (and therefore which
    events count as late) nondeterministic. Call after writing: each
    dir's files get mtime base+i seconds in argument order.
    """
    import time

    base = time.time() - 600
    for i, d in enumerate(dirs):
        for root, _subdirs, files in os.walk(d):
            for f in files:
                p = os.path.join(root, f)
                os.utime(p, (base + i, base + i))
