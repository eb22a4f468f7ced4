"""bench.py contract: the driver runs it headless at end of round and a
round without a valid JSON line is a failed round — so the CLI surface
itself is under test (subprocess, CPU platform hatch, tiny config)."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(extra_env):
    env = dict(os.environ)
    env.update({
        "NERF_BENCH_PLATFORM": "cpu",
        "NERF_BENCH_SIZE": "16",
        "NERF_BENCH_REPEATS": "1",
        "NERF_BENCH_SAMPLES": "8,16",
        "NERF_BENCH_ACCEL_RES": "16",
        "NERF_BENCH_DEADLINE": "0",
    })
    env.update(extra_env)
    out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one JSON line, got {out.stdout!r}"
    rec = json.loads(lines[0])
    for field in ("metric", "value", "unit", "vs_baseline"):
        assert field in rec, rec
    return rec


def test_bench_auto_accel_keeps_or_falls_back():
    """Default config (ACCEL=auto): either outcome is fine, but the record
    must be valid and unflagged — auto may never emit an error for a
    below-contract accel run, it must fall back to the exact path."""
    rec = _run_bench({})
    assert rec["value"] > 0
    assert "error" not in rec
    if "+accel" in rec["metric"]:
        assert rec["accel_psnr_db"] >= 40.0
    else:
        assert "auto-rejected" in rec.get("note", "") or "auto-disabled" in rec.get("note", "")


def test_bench_auto_rejects_bad_accel_config():
    """A culling config mis-tuned on purpose: auto must report the exact
    path (no +accel tag, no error) with the rejection note."""
    rec = _run_bench({"NERF_BENCH_ACCEL_T": "0.9", "NERF_BENCH_ACCEL_SLACK": "0"})
    assert rec["value"] > 0
    assert "error" not in rec
    assert "+accel" not in rec["metric"]
    assert "auto-rejected" in rec.get("note", "")


def test_bench_explicit_accel_flags_bad_config_as_error():
    """NERF_BENCH_ACCEL=1 keeps round-1 semantics: a below-contract run is
    reported but flagged invalid (vs_baseline zeroed + error field)."""
    rec = _run_bench({"NERF_BENCH_ACCEL": "1",
                      "NERF_BENCH_ACCEL_T": "0.9", "NERF_BENCH_ACCEL_SLACK": "0"})
    assert rec["vs_baseline"] == 0.0
    assert "accel_psnr_db" in rec and rec["accel_psnr_db"] < 40.0
    assert "40 dB contract" in rec["error"]
