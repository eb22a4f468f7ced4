#!/usr/bin/env bash
# Sequential TPU A/B sweep of the PLAN.md perf backlog. ONE TPU client at
# a time (the tunneled chip serializes clients; parallel runs wedge it).
# Each config is a fresh process under `timeout`; results append as JSON
# lines to $1 (default /tmp/tpu_ab.jsonl). Safe to re-run; it probes the
# tunnel first and exits 2 if the backend is down.
set -u
LOG="${1:-/tmp/tpu_ab.jsonl}"
cd "$(dirname "$0")/.."
# Persistent XLA compile cache: the legs are fresh processes compiling
# mostly identical programs (~30-90 s each on the tunneled backend).
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}"

# Reuse bench.py's daemon-thread device probe (single source of truth).
probe() {
  # flock -n: skip when another TPU client holds the lock (see bench.py).
  flock -n "${NERF_TPU_LOCK:-/tmp/nerf_tpu.lock}" timeout 120 python -c \
    'import sys, bench; sys.exit(0 if bench._backend_alive(100) is None else 1)'
}

if [ "${TPU_AB_NO_PROBE:-0}" != "1" ] && ! probe; then
  # NOTE: flock -n makes a BUSY chip (another client holding the lock)
  # indistinguishable from an outage here. TPU_AB_NO_PROBE=1 skips the
  # probe and lets each leg wait on the lock instead — use it when
  # queueing legs behind a long-running chain/distill.
  echo "tunnel down (or busy — TPU_AB_NO_PROBE=1 to queue anyway)" >&2
  exit 2
fi

# Leg selection for short tunnel windows:
#   TPU_AB_LEGS="a b c"  — run only these legs (watcher runs a core subset
#                          first so convergence isn't starved by the full
#                          frontier sweep)
#   TPU_AB_SKIP_DONE=1   — skip legs that already have a clean (error-free)
#                          record in $LOG (the follow-up full sweep then
#                          only runs what's missing)
run() {
  local name="$1"; shift
  if [ -n "${TPU_AB_LEGS:-}" ]; then
    case " $TPU_AB_LEGS " in *" $name "*) ;; *) return 0 ;; esac
  fi
  if [ "${TPU_AB_SKIP_DONE:-0}" = "1" ] \
     && grep "\"config\": \"$name\"" "$LOG" 2>/dev/null | grep -qv '"error"'; then
    echo "=== $name: clean record exists, skipping ===" >&2
    return 0
  fi
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  local out
  # Internal deadline below the shell timeout so a mid-run wedge still
  # yields bench.py's diagnostic JSON record, not a bare "exit 124".
  out=$(timeout 1800 env "$@" NERF_BENCH_INIT_TIMEOUT=240 \
        NERF_BENCH_LOCK_WAIT=900 \
        NERF_BENCH_DEADLINE=1500 python bench.py 2>/tmp/tpu_ab_stderr.log)
  local rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "{\"config\": \"$name\", \"error\": \"exit $rc\"}" >> "$LOG"
    tail -3 /tmp/tpu_ab_stderr.log >&2
  else
    echo "$out" | sed "s/^{/{\"config\": \"$name\", /" >> "$LOG"
  fi
  tail -1 "$LOG" >&2
}

# FIRST: the exact config the end-of-round driver runs (defaults, auto
# accel) — if the tunnel window is short, this is the number that counts.
run default_800         NERF_BENCH_SIZE=800
# Render-mode ladder
run base_800            NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=0
run interleave_800      NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=0 NERF_FUSED_INTERLEAVE=1
run psampling_800       NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=0 NERF_BENCH_SAMPLING=pallas
run accel_800           NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=none NERF_BENCH_AABB_PROBES=0 NERF_BENCH_RANGE_STRIDE=1
# Compaction impl A/B (historical: BOTH lose to dense — scatter 44 K,
# gather 21 K vs 291 K exact, 2026-08-18; cull disabled for isolation):
run accel_gc_800        NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=gather NERF_BENCH_CULL_RAYS=0
run accel_scatter_800   NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=scatter NERF_BENCH_CULL_RAYS=0
# Accel redesign (2026-08-18, round 3): mask-only culling (dense MLP,
# occupancy-zeroed sigma — zero compaction overhead) + ray-level packing
# (background rays composited without rendering). accel_mask isolates the
# mask overhead; accel_cull is the combined new default accel path.
run accel_mask_800      NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=none NERF_BENCH_CULL_RAYS=0 NERF_BENCH_AABB_PROBES=0 NERF_BENCH_RANGE_STRIDE=1
run accel_cull_800      NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=none NERF_BENCH_AABB_PROBES=0 NERF_BENCH_RANGE_STRIDE=1
run accel_cull_aabb     NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=none NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=0 NERF_BENCH_RANGE_STRIDE=1
run accel_cull_probe    NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=none NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=1
# accel_compact=off: NO per-sample culling — the grid steers ray packing
# + AABB placement only. Motivation: the occupancy mask alone measured 40%
# of a dense frame (accel_mask_800: 182K vs base 298K) while zeroing sigma
# only where it is already ~0; with it off, rendered rays are bitwise
# exact and only packed-away background rays deviate (PSNR-guarded).
run accel_off_800       NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_AABB_PROBES=0 NERF_BENCH_RANGE_STRIDE=1
run accel_off_aabb      NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=0 NERF_BENCH_RANGE_STRIDE=1
# Probe-culling WITHOUT placement change (off mode): placement-exact
# 64+128 with ~33% of rays packed away (the headline candidate):
run accel_off_probe     NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=1
# Strided probe ranges (accel.strided_ray_ranges): full-res 800^2x128
# probing measured ~0.6 s/frame of XLA gathers — stride 4 cuts them 16x
# with a conservative 3x3 union-pool. These are the headline candidates:
run off_probe_s4        NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4
run off_probe_s8        NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=8
# Headline-variant tuning around the measured winner (off_probe_s4,
# 377 K rays/s @ 87 dB): stride neighbors, a tighter occupancy grid
# (sigma 0.5 vs the 0.01 default — fewer cells -> more rays packed away),
# and a 256^3 grid (finer probes find tighter runs).
run off_probe_s2        NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=2
run off_probe_s6        NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=6
run off_probe_s4_thresh NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4 NERF_BENCH_ACCEL_THRESH=0.5
run off_probe_s4_256    NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4 NERF_BENCH_ACCEL_RES=256
run s32x64_off_probe_s4 NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=32,64 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4
run s64x0_off_probe_s4  NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=64,0 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4
run s32x64_off_aabb     NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=32,64 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=0 NERF_BENCH_RANGE_STRIDE=1
run s32x64_off_probe    NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=32,64 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=1
run s64x0_off_aabb      NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=64,0 NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=0 NERF_BENCH_RANGE_STRIDE=1
# Winner combos
run accel_interleave    NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_FUSED_INTERLEAVE=1
run accel_psampling     NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_BENCH_SAMPLING=pallas
# Train mode (train_xla = XLA-autodiff baseline for the fused custom-VJP
# backward: the number that justifies the backward kernel's existence)
run train               NERF_BENCH_MODE=train
run train_xla           NERF_BENCH_MODE=train NERF_BENCH_IMPL=xla
run train_accel         NERF_BENCH_MODE=train NERF_BENCH_ACCEL=1
# Frontier: rays/s-vs-PSNR curve (docs/PERF.md decision table).
# Denser grid (finer empty-space test -> fewer false-occupied cells):
run accel256_800        NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_RES=256
# Tighter termination culling (T threshold up, slack down; accel_psnr_db
# guards the contract):
run accel_tight_800     NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_T=1e-4 NERF_BENCH_ACCEL_SLACK=1.0
# The reference's own reduced-sample wasm preset (src/lib.rs:603-612),
# exact and accelerated (full_psnr_db records the quality trade):
run s32x64_800          NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=0 NERF_BENCH_SAMPLES=32,64
run s32x64_accel_800    NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=32,64 NERF_BENCH_ACCEL=1
run s32x64_psampling    NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=0 NERF_BENCH_SAMPLES=32,64 NERF_BENCH_SAMPLING=pallas
# AABB-clamped sample placement (accel_sample_aabb): same sample count
# concentrated on the occupied span — the quality-per-sample lever. The
# reduced-sample legs are the payoff (full_psnr_db is the quality record):
run accel_aabb_800      NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1
run s32x64_accel_aabb   NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=32,64 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1
run s16x32_accel_aabb   NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=16,32 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1
# Per-ray probe-refined ranges (tighter than the box chord; CPU spot
# checks are seed-noisy at tiny sizes — the 800x800 full_psnr_db decides):
run s32x64_aabb_probe   NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=32,64 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=128
# Fused-resample kernel on the AABB-clamped reduced preset (per-ray far
# support landed round 3 — the kernel serves (32,64) and clamped modes):
run s32x64_aabb_psamp   NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=32,64 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_SAMPLING=pallas
run s16x32_aabb_probe   NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=16,32 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_AABB_PROBES=128
# Kernel batch-tile width (default 1024; VMEM pressure vs per-step overhead):
run tile512_800         NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=0 NERF_FUSED_TILE=512
run tile2048_800        NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=0 NERF_FUSED_TILE=2048
# Student-architecture throughput (ArchConfig family; random weights — the
# speed side of the distillation frontier before a student is trained):
run student128_800      NERF_BENCH_SIZE=800 NERF_BENCH_ARCH=128,64
run student128_s32x64   NERF_BENCH_SIZE=800 NERF_BENCH_ARCH=128,64 NERF_BENCH_SAMPLES=32,64
# Int8 W8A8 (models/quant.py, XLA int8 MXU matmuls): speed side on the
# canonical arch and the 128-student; quality rides the QAT distill
# (train --impl int8qat), PTQ alone measured 39.4 dB (tools/int8_study.py).
run int8_800            NERF_BENCH_SIZE=800 NERF_BENCH_IMPL=int8 NERF_BENCH_ACCEL=0
run int8_probe          NERF_BENCH_SIZE=800 NERF_BENCH_IMPL=int8
run int8_student128     NERF_BENCH_SIZE=800 NERF_BENCH_IMPL=int8 NERF_BENCH_ARCH=128,64
run int8_student_s32x64 NERF_BENCH_SIZE=800 NERF_BENCH_IMPL=int8 NERF_BENCH_ARCH=128,64 NERF_BENCH_SAMPLES=32,64
# Hash-grid family throughput (Instant-NGP encoding, models/hashgrid.py;
# random tables — the speed side before one is distilled). The gathers,
# not matmuls, dominate: this measures XLA's TPU gather path at the
# default L=16/T=2^17 config, full and reduced sample counts.
run hashgrid_800        NERF_BENCH_SIZE=800 NERF_BENCH_MODEL=hashgrid
run hashgrid_s32x64     NERF_BENCH_SIZE=800 NERF_BENCH_MODEL=hashgrid NERF_BENCH_SAMPLES=32,64
# Table-gradient A/B: default is the sorted segment-sum custom VJP
# (XLA colliding-index scatter-add measured 467 rays/s, 2026-08-19):
run hashgrid_train      NERF_BENCH_MODE=train NERF_BENCH_MODEL=hashgrid
run hashgrid_train_sc   NERF_BENCH_MODE=train NERF_BENCH_MODEL=hashgrid NERF_HASH_GRAD=scatter
run hashgrid_train_srt  NERF_BENCH_MODE=train NERF_BENCH_MODEL=hashgrid NERF_HASH_GRAD=sorted
# Single-pass mode (n_fine=0): no hierarchical resampling — the
# Instant-NGP regime. The hash leg halves its field evals; the MLP leg
# pairs it with accel+aabb as a deep point on the rays/s-vs-PSNR frontier.
run hashgrid_s128x0     NERF_BENCH_SIZE=800 NERF_BENCH_MODEL=hashgrid NERF_BENCH_SAMPLES=128,0
run s128x0_accel_aabb   NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=128,0 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1
# CPU study (docs/PERF.md): 64+0 beats 16+32 by ~5 dB at equal evals —
# the deepest staged frontier point, aabb-concentrated:
run s64x0_accel_aabb    NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLES=64,0 NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1
echo "done -> $LOG" >&2
