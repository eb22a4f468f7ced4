"""Tool-script contracts (tools/ are part of the deliverable: the sweep's
results pipeline must not bitrot before the tunnel window that needs it)."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_summarize_ab(tmp_path):
    rows = [
        {"config": "base_800", "value": 300000.0, "vs_baseline": 0.03},
        {"config": "accel_800", "value": 900000.0, "vs_baseline": 0.09,
         "accel_psnr_db": 43.0},
        {"config": "accel_800", "value": 950000.0, "vs_baseline": 0.095,
         "accel_psnr_db": 44.0},   # later rerun supersedes
        {"config": "accel_tight_800", "value": 1200000.0, "vs_baseline": 0.0,
         "accel_psnr_db": 31.0, "error": "accel_psnr_db 31.0 < 40 dB contract"},
        {"config": "train", "value": 800000.0, "vs_baseline": 0.8},
        {"config": "train_xla", "value": 400000.0, "vs_baseline": 0.4},
    ]
    p = tmp_path / "ab.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\nnot json\n")
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "summarize_ab.py"), str(p)],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    txt = out.stdout
    assert "| accel_800 | 950,000 |" in txt          # last record wins
    assert "accel_800 vs base_800: 3.17x" in txt
    assert "WINNER" in txt
    assert "accel_tight_800: INVALID" in txt         # guard-flagged leg
    assert "train vs train_xla: 2.00x" in txt


def test_sweep_scripts_parse():
    for script in ("tpu_ab.sh", "tpu_watch.sh", "tpu_convergence.sh",
                   "tpu_ab_smoke.sh"):
        subprocess.run(["bash", "-n", str(ROOT / "tools" / script)],
                       check=True, timeout=30)


def test_int8_study_syntax():
    """tools/int8_study.py stays importable/parseable (it monkey-patches
    render.get_mlp_fn — a study script, but syntax rot would silently
    kill the recorded decision path)."""
    import ast
    from pathlib import Path

    src = (Path(__file__).resolve().parent.parent / "tools" / "int8_study.py")
    ast.parse(src.read_text())
