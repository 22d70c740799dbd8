"""Monitor-report golden (r6 brief #8): the full 10-section
monitor_report() dict, collected at the smoke fixture scale and
compared to a pinned golden file — the engine analog of the
reference's own committed run outputs (testing-results/*.log, whose
published numbers tests/test_golden_metrics.py already replays
line-by-line; this test pins the COMPOSED report the monitor's main
loop prints, peerdb_psql_clickhouse_monitor.ps1:1255-1340).

Regenerate after a deliberate change with:
    MONITOR_GOLDEN_REGEN=1 python -m pytest tests/test_monitor_golden.py
A failure here means either a monitor section's computation changed
(pin the new golden on purpose) or the driver regenerated
/root/testdata with different content (regen + note it).
"""

from __future__ import annotations

import datetime as dt
import decimal
import json
import os

from peerdb_cdc_psql_clickhouse_spark.operators.monitor import (
    SECTIONS,
    monitor_report,
)

SF = "/root/testdata/sf0.001"
GOLDEN = os.path.join(
    os.path.dirname(__file__), "fixtures", "monitor_golden_sf0001.json"
)


def _canon_val(v):
    if isinstance(v, float):
        return round(v, 6)  # partial-agg order must not flap the pin
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return [_canon_val(x) for x in v]
    if hasattr(v, "asDict"):
        return {k: _canon_val(x) for k, x in v.asDict().items()}
    return v


def _canon_report(spark) -> dict:
    # fixed UI prober: the golden must not depend on whether some
    # localhost:3000 happens to answer on the test machine
    rep = monitor_report(spark, SF, ui_probe=lambda: "Unavailable")
    out = {}
    for section, df in rep.items():
        rows = sorted(
            ([_canon_val(v) for v in row] for row in df.collect()),
            key=repr,
        )
        out[section] = {"columns": df.columns, "rows": rows}
    return out


def test_monitor_report_matches_golden(spark):
    got = _canon_report(spark)
    assert set(got) == set(SECTIONS)
    if os.environ.get("MONITOR_GOLDEN_REGEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
            f.write("\n")
    with open(GOLDEN) as f:
        want = json.load(f)
    assert set(got) == set(want)
    for section in SECTIONS:
        assert got[section]["columns"] == want[section]["columns"], section
        assert got[section]["rows"] == want[section]["rows"], (
            f"section {section!r} drifted from the pinned golden "
            "(see module docstring for the regen protocol)"
        )
