"""Multimodal pipeline stubs + monitor_report composition."""

from __future__ import annotations

from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
from peerdb_cdc_psql_clickhouse_spark.operators.monitor import (
    SECTIONS,
    monitor_report,
)
from peerdb_cdc_psql_clickhouse_spark.operators.multimodal import (
    attach_media,
    extract_features,
    resize_images,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def test_extract_features_arrow_batches(spark):
    media = attach_media(load_table(spark, SF, "documents"))
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    assert all(r["byte_mean"] > 0 for r in rows)
    assert {r["mime"] for r in rows} == {
        "image/png", "audio/wav", "video/mp4"
    }


def test_resize_images_stub(spark):
    media = attach_media(load_table(spark, SF, "documents"))
    out = resize_images(media, 224, 224).collect()
    n_imgs = media.filter("meta.mime = 'image/png'").count()
    assert len(out) == n_imgs
    want = 224 * 224 // 64
    assert all(len(r["payload"]) == want for r in out)
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)


def test_sample_frames_row_expansion(spark):
    media = attach_media(load_table(spark, SF, "documents"))
    frames = sample_frames(media, every_n=4)
    got = frames.collect()
    n_videos = media.filter("meta.mime = 'video/mp4'").count()
    assert len(got) >= n_videos  # >=1 frame per video
    assert all(r["frame_idx"] % 4 == 0 for r in got)
    assert all(len(r["frame"]) <= 1024 for r in got)


def test_monitor_report_all_sections(spark):
    report = monitor_report(spark, SF)
    assert set(report) == set(SECTIONS)
    for section, df in report.items():
        assert df.count() > 0, f"section {section} is empty"


def test_connectivity_summary_pluggable_ui_probe(spark):
    """Section 8 (monitor.ps1:984-1025): source/target probes derive
    from data-plane scans; the UI liveness ping is pluggable and its
    result lands in the 'PeerDB UI' row."""
    from peerdb_cdc_psql_clickhouse_spark.operators.monitor import (
        connectivity_summary,
        ui_probe_http,
    )

    got = {
        r["service"]: r["status"]
        for r in connectivity_summary(
            spark, SF, ui_probe=lambda: "Available"
        ).collect()
    }
    assert got == {
        "PostgreSQL (Source)": "Connected",
        "ClickHouse (Target)": "Connected",
        "PeerDB UI": "Available",
    }
    # default prober against a closed port reports Unavailable
    assert ui_probe_http("http://localhost:59999", 0.5) == "Unavailable"


def test_monitor_report_section8_default_prober(spark):
    """No UI server in this container: the default HTTP prober yields
    an 'Unavailable' row rather than raising."""
    report = monitor_report(spark, SF)
    s8 = {
        r["service"]: r["status"]
        for r in report["performance_summary"].collect()
    }
    assert s8["PeerDB UI"] in ("Available", "Unavailable")
    assert s8["PostgreSQL (Source)"] == "Connected"
