"""Round-13 verdict #1: load-aware bench plumbing (pure logic — no
Spark sessions, no timing)."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(__file__), "..", "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_load_markers_have_loadavg():
    m = bench._load_markers()
    assert "loadavg" in m and len(m["loadavg"]) == 3


def test_foreign_busy_frac_in_unit_interval():
    f = bench._foreign_busy_frac(sample_sec=0.05)
    assert f is None or 0.0 <= f <= 1.0


def test_drift_check_flags_only_spread_covered_queries():
    committed = {"spread": {"a": [1.0, 2.0], "b": [0.5, 1.0]}}
    med = {"a": 3.5, "b": 1.2, "c": 99.0}  # c has no committed spread
    drifted, covered = bench._drift_check(med, committed)
    assert drifted == ["a"]  # 3.5 > 1.5*2.0; b under 1.5*1.0
    assert covered == 2


def test_rerun_reason_load_threshold():
    assert bench._tier_rerun_reason(0.9, {}, None) is not None
    assert bench._tier_rerun_reason(0.05, {}, None) is None
    assert bench._tier_rerun_reason(None, {}, None) is None


def test_rerun_reason_drift_needs_more_than_one():
    committed = {
        "spread": {f"q{i}": [1.0, 1.0] for i in range(8)}
    }
    one_bad = {
        "queries": {f"q{i}": (9.0 if i == 0 else 1.0) for i in range(8)}
    }
    # 1 of 8 drifted: below max(1, 2) -> no rerun (single-query swings
    # are normal variance, not box load)
    assert bench._tier_rerun_reason(0.0, one_bad, committed) is None
    three_bad = {
        "queries": {f"q{i}": (9.0 if i < 3 else 1.0) for i in range(8)}
    }
    assert bench._tier_rerun_reason(0.0, three_bad, committed)


def test_rerun_reason_streaming_mean_batch(  # r14: verdict #1 coverage gap
):
    committed = {"mean_batch_sec": 1.0}
    ok = {"mean_batch_sec": 1.2, "queries": {}}
    drifted = {"mean_batch_sec": 1.8, "queries": {}}
    assert bench._tier_rerun_reason(0.0, ok, committed) is None
    assert bench._tier_rerun_reason(0.0, drifted, committed)
    # no committed value -> never a phantom rerun
    assert bench._tier_rerun_reason(0.0, drifted, None) is None
    assert bench._tier_rerun_reason(0.0, drifted, {}) is None


def test_disk_fsync_marker_recorded():  # r14: verdict #2 disk-day marker
    m = bench._load_markers()
    assert "disk_fsync_ms" in m
    assert m["disk_fsync_ms"] is None or m["disk_fsync_ms"] >= 0.0


def test_run_tier_load_aware_keeps_better_total(monkeypatch):
    calls = []

    def run_once():
        calls.append(1)
        # first pass slow (loaded), second pass fast
        return {"total": 100.0 if len(calls) == 1 else 40.0, "queries": {}}

    monkeypatch.setattr(bench, "_foreign_busy_frac", lambda *a, **k: 0.9)
    out = bench._run_tier_load_aware("docs100x", run_once, None)
    assert len(calls) == 2
    assert out["total"] == 40.0
    assert out["rerun"]["kept"] == "second"
    assert out["rerun"]["first_total"] == 100.0
    assert "pre" in out["load"] and "post_rerun" in out["load"]


def test_run_tier_load_aware_no_rerun_when_quiet(monkeypatch):
    calls = []

    def run_once():
        calls.append(1)
        return {"total": 10.0, "queries": {"q": 1.0}}

    monkeypatch.setattr(bench, "_foreign_busy_frac", lambda *a, **k: 0.0)
    committed = {"scales": {"docs10x": {"spread": {"q": [0.9, 1.1]}}}}
    out = bench._run_tier_load_aware(
        "docs10x", run_once, committed
    )
    assert len(calls) == 1
    assert "rerun" not in out
    assert "load" in out


def test_latest_committed_bench_reads_full_artifact():
    b = bench._latest_committed_bench()
    assert b is not None  # repo commits bench_out.json alongside BENCH_r*
    assert "queries" in b  # full fidelity, not the compact tail line
    assert "spread" in next(
        v for v in b["scales"].values() if isinstance(v, dict) and "spread" in v
    )
