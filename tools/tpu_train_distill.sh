#!/usr/bin/env bash
# Training-convergence demonstration on TPU (VERDICT r1 item 4): distill
# the pretrained lego teacher into freshly-initialized networks, evaluate
# PSNR vs teacher at 400x400 (target >= 30 dB), export to the reference
# .bin format, and verify the exported weights load + render. ONE TPU
# client at a time — run only when nothing else is on the tunnel.
#
#   bash tools/tpu_train_distill.sh [ckpt_dir] [steps] [log.txt]
set -u
CKPT="${1:-/tmp/distill_ckpt}"
STEPS="${2:-20000}"
LOG="${3:-/tmp/tpu_train_distill.log}"
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c \
    'import sys, bench; sys.exit(0 if bench._backend_alive(100) is None else 1)'
}
if ! probe; then
  echo "tunnel down" >&2
  exit 2
fi

{
  echo "=== train ($(date -Is)) steps=$STEPS ckpt=$CKPT ==="
  # Resumable: re-running continues from the latest checkpoint. SIGTERM
  # checkpoints and exits 0, so a timeout still leaves a resume point.
  timeout 7200 python -m nerf_rs_tpu train \
    --steps "$STEPS" --batch-rays 16384 --checkpoint-dir "$CKPT" \
    --checkpoint-every 2000 --log-every 100 \
    --accel-every 1000 --accel-warmup 2000 || exit 3

  echo "=== evaluate 400x400 ($(date -Is)) ==="
  timeout 1800 python -m nerf_rs_tpu evaluate \
    --checkpoint-dir "$CKPT" --size 400 || exit 4

  echo "=== export + round-trip check ($(date -Is)) ==="
  # Export the latest checkpoint to the reference .bin format, re-import,
  # and require the re-imported weights to reproduce the student's render
  # exactly (the TF-golden tolerances pin the TEACHER, not a student —
  # the meaningful gate for an export is losslessness of the format).
  timeout 1800 env DISTILL_CKPT="$CKPT" python - <<'EOF' || exit 5
import os
import numpy as np, jax
from nerf_rs_tpu.config import TrainConfig, RenderConfig
from nerf_rs_tpu.io.checkpoint import (latest_checkpoint, restore_checkpoint,
                                       export_reference_format)
from nerf_rs_tpu.io.weights import load_nerf_params, find_lego_assets
from nerf_rs_tpu.io.golden import load_golden, camera_from_golden
from nerf_rs_tpu.render import render_image
from nerf_rs_tpu.train import create_train_state

ckpt = latest_checkpoint(os.environ["DISTILL_CKPT"])
state = restore_checkpoint(ckpt, create_train_state(jax.random.key(0), TrainConfig()))
export_reference_format("/tmp/distill_export", state.params)
re = {"coarse": load_nerf_params("/tmp/distill_export/coarse"),
      "fine": load_nerf_params("/tmp/distill_export/fine")}
cam = camera_from_golden(load_golden(find_lego_assets()/"tf_reference_samples.json"))
cfg = RenderConfig(n_coarse=16, n_fine=32, ray_chunk=4096)
a = np.asarray(render_image(jax.device_put(state.params["coarse"]),
                            jax.device_put(state.params["fine"]),
                            cam, 64, 64, jax.random.key(0), cfg))
b = np.asarray(render_image(re["coarse"], re["fine"], cam, 64, 64,
                            jax.random.key(0), cfg))
err = float(np.abs(a - b).max())
print(f"export round-trip max abs err {err:.2e}")
assert err < 1e-5, "exported .bin does not reproduce the student"
print("export verified")
EOF
  echo "=== done ($(date -Is)) ==="
} 2>&1 | tee "$LOG"
