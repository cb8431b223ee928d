"""Bit-rot guards for the measurement scripts in scripts/.

The probes (scale_curve, streaming_drain_probe) reach into bench and
the query modules for their fixtures and canaries; a rename there
would silently kill the repo's scaling instrumentation between
rounds. These tests pin the import surface only — no SparkSession,
no timing (timings are evidence artifacts, not assertions).
"""

from __future__ import annotations

import importlib
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def test_streaming_drain_probe_surface():
    m = importlib.import_module("streaming_drain_probe")
    assert set(m.DRAINS) == {
        "streaming_dedup_drain",
        "streaming_sessionize_drain",
    }
    assert all(callable(f) for f in m.DRAINS.values())


def test_scale_curve_canaries_are_benchs():
    """The frozen canary plans must stay single-sourced in bench
    (ADVICE r8): the curve scripts import them, never re-define them."""
    import bench

    sc_src = open("/root/repo/scripts/scale_curve.py").read()
    dp_src = open("/root/repo/scripts/streaming_drain_probe.py").read()
    for src in (sc_src, dp_src):
        assert "bench.trivial_canary" in src
        assert "bench.shuffle_canary" in src
        assert "def trivial_canary" not in src
        assert "def shuffle_canary" not in src
    assert callable(bench.trivial_canary)
    assert callable(bench.shuffle_canary)
