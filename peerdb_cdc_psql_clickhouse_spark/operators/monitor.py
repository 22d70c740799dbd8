"""monitor_report(): the reference's 10-section monitoring/analysis
report (peerdb_psql_clickhouse_monitor.ps1 main, :1255-1340) as ONE
engine entry point returning a dict of DataFrames — SURVEY §3.2's
lifecycle equivalent. Where the reference shells into containers and
regex-parses stdout per section, every section here is a declared
DataFrame over structured inputs; nothing crosses a process boundary
until the caller collects.

Sections map 1:1 to the PowerShell functions (reference file:line in
each entry); all builders are the already-declared §2 operators, so
each section is independently oracle-checked by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import all_queries

# section name -> (declared query powering it, reference function)
SECTIONS = {
    # 1 Show-SystemPerformancePhases (:334-432): per-batch log rollup
    "system_performance": "d10_batch_rollup",
    # 2 Get-PeerDBServerHealth (:523-583): version/latency probes
    "server_health": "r10_version_probe",
    # 3 Get-PeerDBTableStats (:589-697): per-table counts + sizes
    "table_stats": "r4_scalar_probes",
    # 4 Get-PeerDBFlowAnalysis (:703-794): lag + classification + pct
    "flow_analysis": "d1_parity_report",
    # 5 Get-CDCOperationsAnalysis (:796-851): I/U/D op counts
    "cdc_operations": "c5_microbatch_sizes",
    # 6 Get-ContainerHealthStatus (:853-918): expected-vs-found status
    "container_health": "d19_container_health",
    # 7 Get-PeerDBResourceUsage (:920-982): CPU/mem usage table
    "resource_usage": "d15_unit_normalize",
    # 8 Get-PerformanceSummary (:984-1025): connectivity probes
    "performance_summary": "r1_probe",
    # 9 Get-DatabaseMetrics (:1027-1105): connections + db sizes
    "database_metrics": "r8_cross_join_group",
    # 10 Show-AnalysisSummary (:1107-1249): trend + peak batches
    "analysis_summary": "d5_run_summary",
}


def monitor_report(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Build all 10 sections lazily (no execution until the caller
    acts). Each value is a small DataFrame; at scale every section
    stays fully distributed until its final limit/agg."""
    queries = all_queries()
    return {
        section: queries[qname].build(spark, sf_dir)
        for section, qname in SECTIONS.items()
    }
