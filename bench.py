"""Benchmark: forward render throughput (rays/s) on the lego scene.

Headline config is the BASELINE.json north-star workload: 800x800 image,
64 coarse + 128 fine samples/ray, hierarchical coarse/fine pipeline on
however many chips are visible. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}
vs_baseline: value / (chips x 10M rays/s) in render mode — the north-star
forward target — and value / (chips x 1M rays/s) in train mode (a full
fwd+bwd+opt step is ~3x the forward FLOPs plus optimizer + collective
work; see BASELINE.md targets — the reference itself publishes no
numbers and cannot train at all).

Env knobs: NERF_BENCH_SIZE (default 800), NERF_BENCH_IMPL (xla|pallas),
NERF_BENCH_DTYPE (float32|bfloat16), NERF_BENCH_REPEATS (default 3),
NERF_BENCH_SAMPLING (xla|pallas), NERF_BENCH_ACCEL (auto|0|1: occupancy-grid
empty-space skipping — PSNR-validated fast mode, tests/test_accel.py;
"auto", the default, keeps the fast number only if it beats the 40 dB
contract and otherwise reports a measured exact-path run),
NERF_BENCH_MODE (render|train: train measures full fwd+bwd+psum optimizer
steps in rays/s with the same 64+128 sample config),
NERF_BENCH_DEADLINE (seconds, default 2400; 0 disables — emit an error
record and exit if the backend wedges mid-run after a healthy init).
Frontier knobs (rays/s-vs-PSNR curve, docs/PERF.md):
NERF_BENCH_SAMPLES ("Nc,Nf", default "64,128" — "32,64" is the reference's
own reduced wasm preset, src/lib.rs:603-612), NERF_BENCH_MODEL
(mlp|hashgrid: field-network family — hashgrid is the Instant-NGP
encoding, random-init unless NERF_BENCH_CHECKPOINT), NERF_BENCH_CHECKPOINT
(a cli-train checkpoint of any family to bench instead of the pretrained
weights), NERF_BENCH_ACCEL_RES
(occupancy grid resolution, default 128), NERF_BENCH_ACCEL_T
(termination-culling T threshold override), NERF_BENCH_ACCEL_SLACK
(termination slack in coarse bins). Accel runs always report
accel_psnr_db vs the exact path at the SAME sample counts; reduced-sample
runs additionally report full_psnr_db vs the 64+128 exact render — the
quality axis of the frontier.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time


def _bench_train(cfg, repeats: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_rs_tpu.config import TrainConfig
    from nerf_rs_tpu.parallel.train_sharded import (
        create_sharded_train_state,
        sharded_train_step,
    )

    batch_rays = int(os.environ.get("NERF_BENCH_TRAIN_RAYS", "16384"))
    arch_env = os.environ.get("NERF_BENCH_ARCH")
    arch = None
    if arch_env:
        # Student-family train throughput (e.g. NERF_BENCH_ARCH=128,64):
        # the work-reduction axis of the 1M-rays/s train target.
        from nerf_rs_tpu.config import ArchConfig

        dims = [int(v) for v in arch_env.split(",")]
        dims += [256, 128, 8, 4][len(dims):]
        arch = ArchConfig(width=dims[0], v_width=dims[1],
                          depth=dims[2], skip_at=dims[3])

    def make_batch(batch_rays):
        kw = {"arch": arch} if arch is not None else {}
        tcfg = TrainConfig(batch_rays=batch_rays,
                           render=cfg.replace(ray_chunk=batch_rays), **kw)
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(batch_rays, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        batch = {
            "origins": jnp.tile(jnp.asarray([[0.0, -4.0, 1.0]], jnp.float32),
                                (batch_rays, 1)),
            "dirs": jnp.asarray(dirs),
            "rgb": jnp.asarray(rng.uniform(size=(batch_rays, 3)).astype(np.float32)),
            "near": jnp.float32(2.0),
            "far": jnp.float32(6.0),
        }
        return tcfg, batch

    tcfg, batch = make_batch(batch_rays)
    mesh, state = create_sharded_train_state(jax.random.key(0), tcfg)
    grid = None
    # Train mode has no PSNR guard, so "auto" does NOT enable accel here —
    # only an explicit NERF_BENCH_ACCEL=1 does.
    if os.environ.get("NERF_BENCH_ACCEL", "0") not in ("0", "", "false", "auto"):
        # Occupancy-culled training throughput: bake the grid from the
        # pretrained teacher (in a real run cli train --accel-every
        # rebuilds it from the student; the culling cost is identical).
        from nerf_rs_tpu.accel import build_scene_grid
        from nerf_rs_tpu.io.weights import find_lego_assets, load_nerf_params

        assets = find_lego_assets()
        if assets is not None:
            grid = build_scene_grid(load_nerf_params(assets / "coarse"),
                                    load_nerf_params(assets / "fine"),
                                    resolution=128)

    key = jax.random.key(1)
    while True:
        try:
            state, metrics = sharded_train_step(mesh, state, batch, key, tcfg,
                                                grid=grid)  # compile
            np.asarray(metrics["loss"])
            break
        except Exception as e:
            # HBM OOM (surfaces as RESOURCE_EXHAUSTED, or as an INTERNAL
            # remote-compile 500 carrying the 'hbm' message on the tunneled
            # backend): halve the batch and recompile. 16384 rays x 64+128
            # samples fwd+bwd measured 170 MB over the 15.75G v5e budget.
            msg = str(e)
            oom = ("RESOURCE_EXHAUSTED" in msg or "hbm" in msg
                   or "memory" in msg.lower())
            if not oom or batch_rays <= 2048:
                raise
            batch_rays //= 2
            print(f"train bench: OOM at batch {batch_rays * 2}, retrying "
                  f"with {batch_rays}", file=sys.stderr)
            tcfg, batch = make_batch(batch_rays)
            mesh, state = create_sharded_train_state(jax.random.key(0), tcfg)
    # Chain several steps per timed repeat with ONE readback at the end:
    # per-step host syncs cost ~24 ms each through the tunnel (measured,
    # tools/profile_dense.py) — ~15% noise on a 16K-ray step if timed
    # individually. Steady-state chained steps are exactly what training
    # wall-clock sees.
    chain = int(os.environ.get("NERF_BENCH_TRAIN_CHAIN", "4"))
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        for j in range(chain):
            state, metrics = sharded_train_step(
                mesh, state, batch, jax.random.fold_in(key, i * chain + j),
                tcfg, grid=grid)
        np.asarray(metrics["loss"])
        times.append((time.perf_counter() - t0) / chain)
    rays_per_s = batch_rays / min(times)
    n_chips = jax.device_count()
    # Chained-step timing measures something different from the historical
    # per-step-synced series (the ~24 ms/step tunnel sync is amortized), so
    # chain != 1 runs are tagged into their own metric series AND carry the
    # chain length as a field — differently-measured runs must not alias.
    chain_tag = f"+chain{chain}" if chain != 1 else ""
    rec = {
        "metric": f"{_metric_name(impl=cfg.impl, dtype=cfg.dtype, accel=grid is not None, sampling=cfg.sampling_impl)}{chain_tag}, {n_chips} chip(s)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        # Train target: 1M rays/s/chip (fwd+bwd+opt; see module docstring).
        "vs_baseline": round(rays_per_s / (n_chips * 1_000_000.0), 4),
    }
    if chain != 1:
        rec["chain"] = chain
    print(json.dumps(rec))


def _samples() -> tuple:
    s = os.environ.get("NERF_BENCH_SAMPLES", "64,128")
    nc, nf = (int(v) for v in s.split(","))
    return nc, nf


def _accel_res() -> int:
    return int(os.environ.get("NERF_BENCH_ACCEL_RES", "128"))


def _metric_name(impl=None, dtype=None, accel=None, sampling=None) -> str:
    """One metric string shared by the success, init-error, and deadline
    records, so metric-keyed joins of bench history see the same benchmark
    across healthy and outage rows. Error paths use the env-derived
    defaults; success paths pass the values that actually ran. (Success
    records append ', N chip(s)' — unknowable during an outage.)"""
    mode = os.environ.get("NERF_BENCH_MODE", "render")
    size = os.environ.get("NERF_BENCH_SIZE", "800")
    if impl is None:
        impl = os.environ.get("NERF_BENCH_IMPL", "pallas")
    if dtype is None:
        dtype = os.environ.get("NERF_BENCH_DTYPE", "bfloat16")
    if accel is None:
        # "auto" (the default) intends the accel path in render mode (error
        # records during an outage are named for the config that would have
        # run) but means OFF in train mode (no PSNR guard) and in student
        # (NERF_BENCH_ARCH) runs (random weights — main forces accel off),
        # so error records join the same metric series as success records.
        env = os.environ.get("NERF_BENCH_ACCEL", "auto")
        off = ("0", "", "false", "auto") if mode == "train" else ("0", "", "false")
        accel = env not in off and not os.environ.get("NERF_BENCH_ARCH")
    if sampling is None:
        sampling = os.environ.get("NERF_BENCH_SAMPLING", "xla")
    nc, nf = _samples()
    accel_tag = ""
    if accel:
        res = _accel_res()
        accel_tag = "+accel" if res == 128 else f"+accel{res}"
        # Every accel tuning knob lands in the name: differently-configured
        # runs must not alias one metric series (this string is the join key
        # for bench history).
        if os.environ.get("NERF_BENCH_ACCEL_T"):
            accel_tag += f"+t{os.environ['NERF_BENCH_ACCEL_T']}"
        if os.environ.get("NERF_BENCH_ACCEL_THRESH"):
            accel_tag += f"+thr{os.environ['NERF_BENCH_ACCEL_THRESH']}"
        if os.environ.get("NERF_BENCH_ACCEL_SLACK"):
            accel_tag += f"+slack{os.environ['NERF_BENCH_ACCEL_SLACK']}"
        probes = os.environ.get("NERF_BENCH_AABB_PROBES", "32")
        if os.environ.get("NERF_BENCH_ACCEL_AABB", "0") not in ("0", "", "false"):
            accel_tag += "+aabb"
            if probes not in ("0", ""):
                accel_tag += f"+probes{probes}"
        elif probes not in ("0", ""):
            # Probe-based ray culling WITHOUT placement change
            # (accel_compact=off): placement-exact, packing-only.
            accel_tag += f"+probecull{probes}"
        if os.environ.get("NERF_BENCH_RANGE_STRIDE", "4") != "1":
            accel_tag += f"+stride{os.environ.get('NERF_BENCH_RANGE_STRIDE', '4')}"
        # accel semantics changed 2026-08-18: the default is now mask-only
        # culling + ray-level packing (no per-sample compaction). Tag any
        # non-default combination so metric series don't alias ("off" =
        # no per-sample culling at all, packing/placement only).
        if os.environ.get("NERF_ACCEL_COMPACT", "off") != "none":
            accel_tag += f"+c{os.environ.get('NERF_ACCEL_COMPACT', 'off')}"
        if os.environ.get("NERF_BENCH_CULL_RAYS", "1") in ("0", "false"):
            accel_tag += "+noraycull"
    suffix = (f"{impl}/{dtype}" + accel_tag
              + ("+psampling" if sampling == "pallas" else ""))
    # Kernel A/B knobs alias the headline series otherwise (this string
    # is the join key; every non-default knob must land in the name).
    if os.environ.get("NERF_FUSED_TRIG", "poly") != "poly":
        suffix += f"+trig{os.environ['NERF_FUSED_TRIG']}"
    if os.environ.get("NERF_FUSED_ENC", "vpu") != "vpu":
        suffix += f"+enc{os.environ['NERF_FUSED_ENC']}"
    if os.environ.get("NERF_FUSED_HEADS", "vpu") != "vpu":
        suffix += f"+heads{os.environ['NERF_FUSED_HEADS']}"
    if os.environ.get("NERF_FUSED_INTERLEAVE", "0") == "1":
        suffix += "+il"
    if os.environ.get("NERF_FUSED_TILE"):
        suffix += f"+ktile{os.environ['NERF_FUSED_TILE']}"
    if os.environ.get("NERF_FUSED_BWD_TILE"):
        suffix += f"+kbt{os.environ['NERF_FUSED_BWD_TILE']}"
    if os.environ.get("NERF_BENCH_SYNC", "scalar") == "scalar" and mode != "train":
        # Round-5 default: the timed loop syncs on a 4-byte scalar
        # reduction of the frame (full data dependency — the render must
        # complete) instead of transferring the 7.7 MB image through the
        # ~30 MB/s tunnel every repeat (~250 ms of pure host IO that real
        # TPU hosts do over PCIe in ~1 ms). Measured: the single-pass
        # frame is 600 ms with the transfer, 372 ms without. Tagged so
        # the differently-measured series never alias; train mode always
        # synced on a scalar loss already.
        suffix += "+devsync"
    if os.environ.get("NERF_BENCH_ARCH"):
        suffix += f"+arch{os.environ['NERF_BENCH_ARCH']}"
    if os.environ.get("NERF_BENCH_WEIGHTS"):
        suffix += "+customweights"
    if os.environ.get("NERF_BENCH_MODEL", "mlp") != "mlp":
        suffix += f"+{os.environ.get('NERF_BENCH_MODEL')}"
        if os.environ.get("NERF_HASH_GRAD", "scatter") != "scatter":
            suffix += f"+g{os.environ['NERF_HASH_GRAD']}"
    if os.environ.get("NERF_BENCH_CHECKPOINT"):
        suffix += "+checkpoint"
    if os.environ.get("NERF_BENCH_CHUNK", "16384") != "16384":
        suffix += f"+chunk{os.environ['NERF_BENCH_CHUNK']}"
    if mode == "train":
        return f"train rays/s (fwd+bwd+opt), {nc}+{nf} samples, {suffix}"
    return f"fwd render rays/s, lego {size}x{size} {nc}+{nf} samples, {suffix}"


def _psnr_db(a, b) -> float:
    import numpy as np

    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return round(-10.0 * math.log10(max(mse, 1e-12)), 1)


def _print_error_record(msg: str) -> None:
    print(json.dumps({
        "metric": _metric_name(), "value": 0.0, "unit": "rays/s",
        "vs_baseline": 0.0, "error": msg,
    }), flush=True)


def _acquire_tpu_lock():
    """Serialize TPU clients across processes (flock on $NERF_TPU_LOCK,
    default /tmp/nerf_tpu.lock). The tunneled chip serializes clients; a
    SECOND concurrent client can wedge the tunnel for everyone — including
    the staged A/B sweep (tools/tpu_ab.sh) and the end-of-round driver
    bench, which may otherwise race each other. Returns the held lock file
    object (kept open for the process lifetime) or raises TimeoutError.

    Skipped for CPU smoke runs (NERF_BENCH_PLATFORM without tpu/axon) and
    when NERF_BENCH_NO_LOCK=1 (caller already holds it)."""
    platform = os.environ.get("NERF_BENCH_PLATFORM", "")
    if platform and "tpu" not in platform and "axon" not in platform:
        return None
    if os.environ.get("NERF_BENCH_NO_LOCK") == "1":
        return None
    import fcntl

    path = os.environ.get("NERF_TPU_LOCK", "/tmp/nerf_tpu.lock")
    # Default dropped 2700 -> 600 s (round-3 post-mortem: the driver's
    # patience ran out before the silent wait did, so the round ended with
    # rc=124 and an EMPTY tail — no record at all). A bench that reports
    # "lock busy" after 10 minutes beats one that says nothing for 45.
    wait_s = float(os.environ.get("NERF_BENCH_LOCK_WAIT", "600"))
    f = open(path, "w")
    deadline = time.monotonic() + wait_s
    announced = False
    while True:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return f
        except OSError:
            if not announced:
                # Immediate heartbeat ON STDOUT: if the caller kills us
                # mid-wait, the captured tail still carries a parseable
                # record naming the cause (instead of round 3's empty
                # tail). A later success record supersedes it — consumers
                # read the LAST JSON line.
                _print_error_record(
                    f"waiting for TPU lock {path} (held by another client; "
                    f"will wait up to {wait_s:.0f}s) — if this is the last "
                    "record, the wait was killed from outside")
                announced = True
            if time.monotonic() >= deadline:
                f.close()
                raise TimeoutError(
                    f"another TPU client held {path} for {wait_s:.0f}s "
                    "(staged sweep / convergence run still going?)")
            time.sleep(5.0)


def _backend_alive(timeout_s: float):
    """Probe device init in a daemon thread — the tunneled axon platform
    can hang jax.devices() indefinitely during outages, and a bench that
    never prints its JSON line is worse than one that reports the outage.
    Returns None when the backend is up, else an error string (the real
    init exception when it raised, a timeout message when it hung)."""
    import threading

    done = {}

    def probe():
        import jax

        try:
            jax.devices()
            done["ok"] = True
        except Exception as e:
            done["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "ok" in done:
        return None
    return done.get("error",
                    f"device backend init timed out after {timeout_s:.0f}s "
                    "(axon tunnel outage?)")


def _arm_deadline(spent: float = 0.0) -> None:
    """The tunneled backend can wedge MID-benchmark (after a healthy init):
    without a deadline the bench then never prints its JSON line at all.
    A daemon timer emits an error record and hard-exits instead. ``spent``
    (seconds already consumed, e.g. by frontier presets) counts against
    the budget so total wall-clock stays within NERF_BENCH_DEADLINE."""
    import threading

    deadline = float(os.environ.get("NERF_BENCH_DEADLINE", "2400"))
    if deadline <= 0:
        return
    remaining = max(deadline - spent, 60.0)

    def fire():
        _print_error_record(f"benchmark exceeded {deadline:.0f}s deadline "
                            "(backend wedged mid-run?)")
        os._exit(3)

    t = threading.Timer(remaining, fire)
    t.daemon = True
    t.start()


# --- frontier presets -----------------------------------------------------
# The bare driver invocation also emits the measured rays/s-vs-quality
# frontier (docs/PERF.md round-4 decision table, vendored weights) as EXTRA
# JSON lines BEFORE the lossless headline: consumers read the LAST line, so
# the headline series is unchanged, while the driver-captured tail now
# carries the frontier evidence too (VERDICT r4 item 2 — round 4's 1.22 M
# rays/s point existed only in the builder's own sweep log).
_FRONTIER_PRESETS = (
    # The quality flagship ≥30 dB point (r5): the vendored single-pass
    # fine-tuned TEACHER, 64+0 samples with probe-refined placement —
    # 1.92-1.94 M rays/s @ 30.4 dB vs the full 64+128 teacher render
    # (devsync series). The un-fine-tuned teacher measures 30.1 dB under
    # the same preset — zero-training; sweep leg teacher_s64x0_probe.
    ("tsp_s64x0_probe", {
        "NERF_BENCH_WEIGHTS": "assets/trained/teacher_sp30",
        "NERF_BENCH_SAMPLES": "64,0",
        "NERF_BENCH_ACCEL": "1",
        "NERF_BENCH_ACCEL_AABB": "1",
        # Sub-second single-pass frames see ~2x tunnel-scheduling noise
        # (measured r5); min-of-8 recovers the config's true rate.
        "NERF_BENCH_REPEATS": "8",
    }),
    # The speed flagship: single-pass fine-tuned student — 3.16-3.20 M
    # rays/s @ 29.3 dB vs teacher (r5 devsync+probes32 series; 32% of
    # the 10 M north star). teacher_sp30 48+0 (2.29 M @ 29.8) sits
    # between the two flagships.
    ("sp29_s64x0_probe", {
        "NERF_BENCH_WEIGHTS": "assets/trained/student128_sp29",
        "NERF_BENCH_SAMPLES": "64,0",
        "NERF_BENCH_ACCEL": "1",
        "NERF_BENCH_ACCEL_AABB": "1",
        "NERF_BENCH_REPEATS": "8",
    }),
    # Train throughput at the production single-pass distill config —
    # 1.110 M rays/s fwd+bwd+opt at batch 65536 (r5): the BASELINE.md
    # >=1 M/chip training target, in the driver-captured record.
    ("train_student_s64x0_b65536", {
        "NERF_BENCH_MODE": "train",
        "NERF_BENCH_ARCH": "128,64",
        "NERF_BENCH_SAMPLES": "64,0",
        "NERF_BENCH_TRAIN_RAYS": "65536",
        "NERF_BENCH_REPEATS": "5",
    }),
    # Distilled student at the FULL 64+128 headline sampling + lossless
    # probe culling — 1.11-1.15 M rays/s @ 30.1 dB vs teacher (r5).
    ("student30_800q", {
        "NERF_BENCH_WEIGHTS": "assets/trained/student128_30db",
    }),
)


def _frontier_presets_due() -> bool:
    """Presets run only on the bare headline invocation (the driver's
    end-of-round `python bench.py`): real TPU, render mode, no env
    overrides that make this some other sweep leg. NERF_BENCH_EXTRA=0
    opts out; CPU smokes must stay one-line (tests/test_bench.py)."""
    if os.environ.get("NERF_BENCH_EXTRA", "1") in ("0", "false"):
        return False
    plat = os.environ.get("NERF_BENCH_PLATFORM", "")
    if plat and "tpu" not in plat and "axon" not in plat:
        return False
    overrides = ("NERF_BENCH_MODE", "NERF_BENCH_SIZE", "NERF_BENCH_SAMPLES",
                 "NERF_BENCH_WEIGHTS", "NERF_BENCH_CHECKPOINT",
                 "NERF_BENCH_ARCH", "NERF_BENCH_MODEL", "NERF_BENCH_IMPL",
                 "NERF_BENCH_DTYPE", "NERF_BENCH_CHUNK",
                 # Accel/timing knobs too: a sweep leg that sets any of
                 # these is NOT the bare headline run, and presets must
                 # not inherit its unrelated overrides.
                 "NERF_BENCH_ACCEL", "NERF_BENCH_ACCEL_AABB",
                 "NERF_BENCH_AABB_PROBES", "NERF_BENCH_RANGE_STRIDE",
                 "NERF_BENCH_ACCEL_RES", "NERF_BENCH_ACCEL_T",
                 "NERF_BENCH_ACCEL_THRESH", "NERF_BENCH_ACCEL_SLACK",
                 "NERF_BENCH_REPEATS", "NERF_BENCH_SYNC",
                 "NERF_BENCH_SAMPLING")
    return not any(os.environ.get(v) for v in overrides)


def _run_frontier_presets(t0: float) -> None:
    """Run each preset as a SUBPROCESS (fresh env-derived config, and the
    parent has not created its TPU client yet — the tunneled chip tolerates
    exactly one client at a time, so children run strictly before the
    parent's backend init) and re-emit its last JSON record tagged with the
    preset name. A preset failure never harms the headline leg."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    deadline = float(os.environ.get("NERF_BENCH_DEADLINE", "2400"))
    reserve = 900.0   # wall-clock kept for the headline leg
    for name, env_over in _FRONTIER_PRESETS:
        if deadline <= 0:
            # Operator disabled the deadline: children inherit that
            # (cold-cache compiles may legitimately exceed any budget).
            remaining, budget = 1e9, 1e9
        else:
            remaining = deadline - (time.monotonic() - t0)
            budget = min(700.0, remaining - reserve)
        if budget < 240.0:
            print(f"frontier preset {name}: skipped "
                  f"({remaining:.0f}s left, reserved for the headline leg)",
                  file=sys.stderr, flush=True)
            continue
        env = dict(os.environ)
        env.update(env_over)
        if "NERF_BENCH_WEIGHTS" in env_over:
            env["NERF_BENCH_WEIGHTS"] = os.path.join(
                repo, env_over["NERF_BENCH_WEIGHTS"])
        env.update({
            "NERF_BENCH_NO_LOCK": "1",       # parent holds the TPU lock
            "NERF_BENCH_EXTRA": "0",         # no recursion
            "NERF_BENCH_DEADLINE": ("0" if deadline <= 0
                                    else str(int(budget))),
            "NERF_BENCH_INIT_TIMEOUT": "180",
        })
        try:
            out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 cwd=repo, env=env, capture_output=True,
                                 text=True,
                                 timeout=None if deadline <= 0
                                 else budget + 120)
        except subprocess.TimeoutExpired:
            print(f"frontier preset {name}: timed out after {budget:.0f}s",
                  file=sys.stderr, flush=True)
            continue
        rec = None
        for line in out.stdout.splitlines():
            if line.strip().startswith("{"):
                try:
                    rec = json.loads(line)   # last JSON line wins
                except ValueError:
                    pass
        if rec is None:
            print(f"frontier preset {name}: no record (rc={out.returncode}) "
                  f"{out.stderr[-300:]}", file=sys.stderr, flush=True)
            continue
        rec["preset"] = name
        print(json.dumps(rec), flush=True)


def main() -> None:
    # Measured accel defaults (sweep 2026-08-19, docs/PERF.md): the
    # winning accel shape is NO per-sample culling + probe-based ray
    # packing on stride-4 subsampled ranges — off_probe_s4 377K rays/s @
    # 87 dB vs dense 298K. Explicit env values override. Set before any
    # record can print so error records join the same metric series.
    # Evaluate the frontier-preset gate BEFORE the setdefault block: the
    # defaults below make NERF_BENCH_AABB_PROBES/RANGE_STRIDE "set", and
    # the gate's override check must see the CALLER's env, not our own
    # defaults (review-fix regression, caught by driver simulation).
    presets_due = _frontier_presets_due()
    os.environ.setdefault("NERF_ACCEL_COMPACT", "off")
    # Probe default 128 -> 32 (round 5): the probe-count sweep
    # (128/64/32/16 on three artifacts) left every PSNR axis unchanged —
    # the stride-4 pooling is the conservative layer — while the ranges
    # program shrank from 49 to ~14 ms (probes are XLA row-gathers at
    # ~125 M rows/s); 16 cost 0.1 dB on sp29. docs/sweeps/r05.jsonl.
    os.environ.setdefault("NERF_BENCH_AABB_PROBES", "32")
    os.environ.setdefault("NERF_BENCH_RANGE_STRIDE", "4")
    if os.environ.get("NERF_BENCH_PLATFORM"):
        # Smoke-test escape hatch (e.g. =cpu): the axon plugin overrides
        # $JAX_PLATFORMS, so the backend must be forced via jax.config
        # BEFORE the first device init (which _backend_alive triggers).
        import jax

        jax.config.update("jax_platforms", os.environ["NERF_BENCH_PLATFORM"])
    # Persistent compile cache shared with the tool scripts: the driver's
    # end-of-round bench then reuses the sweep's compiled programs instead
    # of paying ~30-90 s per program on the tunneled backend.
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        _tpu_lock = _acquire_tpu_lock()  # noqa: F841 — held until exit
    except TimeoutError as e:
        _print_error_record(str(e))
        return
    # Deadline budget starts AFTER the lock: waiting out another client's
    # flock (chain legs wait up to NERF_BENCH_LOCK_WAIT=3600s) must not
    # consume the benchmark's own time budget.
    t0 = time.monotonic()
    if presets_due:
        # BEFORE the parent's own backend init: one TPU client at a time.
        _run_frontier_presets(t0)
    init_timeout = float(os.environ.get("NERF_BENCH_INIT_TIMEOUT", "300"))
    init_error = _backend_alive(init_timeout)
    if init_error is not None:
        _print_error_record(init_error)
        return
    _arm_deadline(spent=time.monotonic() - t0)

    from nerf_rs_tpu.config import RenderConfig
    from nerf_rs_tpu.io.golden import camera_from_golden, load_golden
    from nerf_rs_tpu.io.weights import find_lego_assets, load_nerf_params
    from nerf_rs_tpu.render import render_image

    size = int(os.environ.get("NERF_BENCH_SIZE", "800"))
    impl = os.environ.get("NERF_BENCH_IMPL", "pallas")
    dtype = os.environ.get("NERF_BENCH_DTYPE", "bfloat16")
    repeats = int(os.environ.get("NERF_BENCH_REPEATS", "3"))
    sampling = os.environ.get("NERF_BENCH_SAMPLING", "xla")
    # Default "auto": try the occupancy-culled fast path, keep it ONLY if it
    # beats the 40 dB accel contract vs the exact render, else report a
    # measured exact-path number instead. A plain `python bench.py` thus
    # lands the best *honest* number available without per-round env tuning.
    accel_env = os.environ.get("NERF_BENCH_ACCEL", "auto")
    accel_auto = accel_env == "auto"
    accel = accel_auto or accel_env not in ("0", "", "false")

    try:
        if impl == "pallas":
            from nerf_rs_tpu.ops.kernels.fused_mlp import fused_nerf_mlp  # noqa: F401
    except Exception:
        impl = "xla"

    nc, nf = _samples()
    # NERF_BENCH_CHUNK: rays per lax.map chunk. 16384 is the measured
    # sweet spot at 64+128 (192 merged samples); reduced/single-pass
    # presets fit 4x more rays per chunk and amortize per-chunk kernel
    # overhead — an A/B axis for the s64x0 frontier.
    chunk = int(os.environ.get("NERF_BENCH_CHUNK", "16384"))
    cfg = RenderConfig(n_coarse=nc, n_fine=nf, ray_chunk=chunk, impl=impl,
                       dtype=dtype, sampling_impl=sampling)
    if os.environ.get("NERF_BENCH_ACCEL_AABB", "0") not in ("0", "", "false"):
        cfg = cfg.replace(accel_sample_aabb=True)
    # Probe culling defaults ON (128 probes, "0" disables): with the
    # stride-4 + compact-off defaults below this makes a BARE
    # `python bench.py` run the measured-best lossless accel config —
    # round 3's off_probe_s4 headline (377 K vs 298 K exact, 87 dB,
    # docs/PERF.md decision table) — instead of relying on callers to
    # remember the winning knobs. The auto race still reports the exact
    # path whenever culling loses (small frames).
    if os.environ.get("NERF_BENCH_AABB_PROBES", "32") not in ("0", ""):
        cfg = cfg.replace(
            accel_aabb_probes=int(os.environ.get("NERF_BENCH_AABB_PROBES",
                                                 "32")))
    if "NERF_BENCH_ACCEL_T" in os.environ:
        cfg = cfg.replace(accel_t_threshold=float(os.environ["NERF_BENCH_ACCEL_T"]))
    if "NERF_BENCH_ACCEL_SLACK" in os.environ:
        cfg = cfg.replace(accel_t_slack_bins=float(os.environ["NERF_BENCH_ACCEL_SLACK"]))
    # Accel-mode shape (2026-08-18 defaults): mask-only culling (dense MLP,
    # occupancy-zeroed sigma — both compaction forms measured slower than
    # dense on v5e) + ray-level packing (background rays never rendered).
    # NERF_ACCEL_COMPACT=scatter|gather re-enables per-sample compaction;
    # NERF_BENCH_CULL_RAYS=0 disables the packing. A/B knobs, off-default.
    cfg = cfg.replace(
        accel_compact=os.environ.get("NERF_ACCEL_COMPACT", "off"),
        accel_cull_rays=os.environ.get("NERF_BENCH_CULL_RAYS", "1")
        not in ("0", "false"),
        accel_range_stride=int(os.environ.get("NERF_BENCH_RANGE_STRIDE",
                                              "4")),
    )
    model_env = os.environ.get("NERF_BENCH_MODEL", "mlp")
    if model_env == "hashgrid":
        # Hash-grid family throughput (models/hashgrid.py) at the default
        # full-size HashGridConfig. Render mode uses random-init params
        # (rays/s is weight-value-independent) unless NERF_BENCH_CHECKPOINT
        # points at a trained one; train mode measures full steps. The
        # family always takes the XLA path (impl applies to the MLP family
        # only) — keep the metric label honest. ray_chunk shrinks to 4096:
        # the encode's gather intermediates are ~300 KB/ray (idx + feats +
        # trilinear weights at L=16x8 corners x 192 samples) — 16384-ray
        # chunks OOM the 16 GB chip (hashgrid_800 exit-1 records,
        # 2026-08-19).
        impl = "xla"
        cfg = cfg.replace(
            model="hashgrid", impl="xla",
            ray_chunk=min(cfg.ray_chunk, 4096),
            # Table-gradient path A/B (NERF_HASH_GRAD=sorted for the
            # segment-sum VJP; scatter won the 2026-08-19 A/B, 556 vs 335
            # rays/s — see HashGridConfig.grad_impl).
            hash=cfg.hash.replace(
                grad_impl=os.environ.get("NERF_HASH_GRAD", "scatter")))
    if os.environ.get("NERF_BENCH_MODE", "render") == "train":
        return _bench_train(cfg, repeats)
    # bfloat16 keeps image-level parity (~40 dB PSNR vs the f32 oracle, same
    # as f32-pallas: both are limited by resampling chaos, not precision).

    assets = find_lego_assets()
    if assets is None:
        print(json.dumps({"metric": "rays/s fwd lego", "value": 0.0, "unit": "rays/s",
                          "vs_baseline": 0.0, "error": "assets missing"}))
        return
    camera = camera_from_golden(load_golden(assets / "tf_reference_samples.json"))
    arch_env = os.environ.get("NERF_BENCH_ARCH")
    weights_env = os.environ.get("NERF_BENCH_WEIGHTS")
    ckpt_env = os.environ.get("NERF_BENCH_CHECKPOINT")
    student = bool(arch_env)
    if ckpt_env:
        # A trained checkpoint of ANY family (cli train output): hashgrid
        # checkpoints carry their hyper-parameters in the model.json
        # sidecar; MLP-family ones are shape-inferred. Accel stays
        # available — the grid is swept with the checkpoint's own field.
        from nerf_rs_tpu.io.checkpoint import (
            hashgrid_render_config, load_model_config, restore_params,
        )
        from pathlib import Path as _P

        loaded, _step = restore_params(ckpt_env)
        loaded = jax.device_put(loaded)
        if "shared" in loaded:
            info = load_model_config(_P(ckpt_env))
            if info is None or info.get("model") != "hashgrid":
                _print_error_record(
                    f"{ckpt_env} is a shared-network checkpoint with no "
                    "model.json sidecar")
                return
            cfg = hashgrid_render_config(info, cfg)
            # Same OOM guard as the random-init hashgrid branch below.
            cfg = cfg.replace(ray_chunk=min(cfg.ray_chunk, 4096))
            params_c = params_f = loaded["shared"]
            # Keep the metric label honest even when NERF_BENCH_MODEL was
            # not set alongside the checkpoint: the family always runs the
            # XLA path, and _metric_name derives the '+hashgrid' tag from
            # the env var (hashgrid and MLP checkpoints must not alias one
            # metric-keyed series).
            impl = "xla"
            cfg = cfg.replace(impl="xla")
            os.environ["NERF_BENCH_MODEL"] = "hashgrid"
        else:
            params_c, params_f = loaded["coarse"], loaded["fine"]
            from nerf_rs_tpu.ops.kernels.fused_mlp import supports_arch

            if impl == "pallas" and not supports_arch(params_c):
                impl = "xla"
                cfg = cfg.replace(impl="xla")
    elif model_env == "hashgrid":
        # Random-init hash-grid throughput: speed side of the family before
        # one is trained. Accel/PSNR machinery is skipped (random tables
        # give a near-uniform density field — a grid would cull nothing
        # meaningful).
        from nerf_rs_tpu.models.hashgrid import init_hashgrid_params

        params_c = params_f = jax.device_put(
            init_hashgrid_params(jax.random.key(1), cfg.hash))
        accel = False
    elif arch_env:
        # Student-architecture throughput (ArchConfig family): random-init
        # params — rays/s is weight-value-independent, so this measures the
        # speed side of a distilled student before one is trained. The
        # fused kernel serves 128-aligned members; others fall back to XLA.
        # Accel/PSNR machinery is skipped (meaningless on random weights).
        from nerf_rs_tpu.config import ArchConfig
        from nerf_rs_tpu.models.mlp import init_nerf_params

        dims = [int(v) for v in arch_env.split(",")]
        dims += [256, 128, 8, 4][len(dims):]
        arch = ArchConfig(width=dims[0], v_width=dims[1],
                          depth=dims[2], skip_at=dims[3])
        from nerf_rs_tpu.ops.kernels.fused_mlp import supports_arch

        if impl == "pallas" and not supports_arch(tuple(dims)):
            # Fused kernel serves the 128-aligned family; others go XLA.
            impl = "xla"
            cfg = cfg.replace(impl="xla")
        params_c = jax.device_put(init_nerf_params(jax.random.key(1), arch=arch))
        params_f = jax.device_put(init_nerf_params(jax.random.key(2), arch=arch))
        accel = False
    elif weights_env:
        # Trained weights from anywhere (e.g. a distilled-student export):
        # a .npz bundle or a reference-format directory with coarse/ + fine/.
        from nerf_rs_tpu.io.weights import load_scene_assets

        from pathlib import Path as _P
        p = _P(weights_env)
        if p.is_file():
            loaded, _ = load_scene_assets(p)
        else:
            loaded = {"coarse": load_nerf_params(p / "coarse"),
                      "fine": load_nerf_params(p / "fine")}
        params_c, params_f = loaded["coarse"], loaded["fine"]
        from nerf_rs_tpu.ops.kernels.fused_mlp import supports_arch
        if impl == "pallas" and not supports_arch(params_c):
            impl = "xla"
            cfg = cfg.replace(impl="xla")
    else:
        params_c = load_nerf_params(assets / "coarse")
        params_f = load_nerf_params(assets / "fine")

    import jax.numpy as jnp
    import numpy as np

    key = jax.random.key(0)

    # Sync method for the timed loop (see _metric_name's +devsync note):
    # "scalar" (default) forces completion via a 4-byte reduction readback;
    # "image" additionally times the full frame's host transfer (the
    # pre-round-5 series; ~250 ms of tunnel IO at 800x800).
    sync_scalar = os.environ.get("NERF_BENCH_SYNC", "scalar") == "scalar"

    def timed(grid):
        # Warmup / compile, then timed repeats. Force completion with a
        # data-dependent readback: on the tunneled 'axon' platform
        # block_until_ready returns before execution completes.
        img = render_image(params_c, params_f, camera, size, size, key, cfg,
                           grid=grid)
        np.asarray(img)
        times = []
        for i in range(repeats):
            t0 = time.perf_counter()
            img = render_image(params_c, params_f, camera, size, size,
                               jax.random.fold_in(key, i), cfg, grid=grid)
            if sync_scalar:
                float(jnp.sum(img))
            else:
                np.asarray(img)
            times.append(time.perf_counter() - t0)
        # The frame itself transfers once, outside the timed loop — the
        # PSNR guards below need host pixels either way.
        return np.asarray(img), min(times)

    grid = None
    auto_note = None
    if accel:
        try:
            from nerf_rs_tpu.accel import build_scene_grid, calibrate_capacities

            from nerf_rs_tpu.accel import hashgrid_grid_kwargs

            grid_kw = (hashgrid_grid_kwargs(cfg)
                       if cfg.model == "hashgrid" else {})
            if os.environ.get("NERF_BENCH_ACCEL_THRESH"):
                # Grid tightness (tools/grid_threshold_study.py): higher
                # sigma thresholds shrink the occupied set -> more rays
                # packed away, tighter AABB/probe spans. PSNR-guarded like
                # every accel knob.
                grid_kw["sigma_threshold"] = float(
                    os.environ["NERF_BENCH_ACCEL_THRESH"])
            grid = build_scene_grid(params_c, params_f,
                                    resolution=_accel_res(), **grid_kw)
            if cfg.accel_compact not in ("none", "off"):
                # Measured capacities: one instrumented render, then the
                # timed renders run with the post-culling live set + 15%
                # margin. Mask-only culling has no capacities to calibrate.
                cfg = calibrate_capacities(params_c, params_f, grid, camera,
                                           size, size, key, cfg)
        except Exception as e:  # degenerate grid, etc.
            if not accel_auto:
                raise
            grid, accel = None, False
            auto_note = f"accel auto-disabled: {type(e).__name__}: {e}"

    img, best = timed(grid)

    accel_psnr = None
    if accel:
        # Guard: a fast accel number only counts if the image still matches
        # the exact path (the accel contract is >40 dB, tests/test_accel.py).
        exact = render_image(params_c, params_f, camera, size, size,
                             jax.random.fold_in(key, repeats - 1), cfg)
        accel_psnr = _psnr_db(exact, img)
        if accel_psnr < 40.0 and accel_auto and not cfg.accel_sample_aabb:
            # Auto mode: below the contract, fall back to a MEASURED exact
            # run so the round still lands a valid number. (Placement-
            # changing aabb configs are judged on full_psnr_db instead —
            # see the invalidation exemption below.)
            auto_note = (f"accel auto-rejected: psnr {accel_psnr} dB < 40 dB "
                         "contract — reporting the exact path")
            grid, accel = None, False
            img, best = timed(None)
        elif accel_auto:
            # Auto mode is a RACE, not a PSNR check alone: time the exact
            # path too and keep whichever is faster. On real TPU the accel
            # path's gather/compaction can lose to the dense pipeline even
            # when its image is fine (measured 2026-08-18: accel 44 K vs
            # exact 291 K rays/s at 800x800) — auto must never report a
            # slower-than-exact headline.
            img_exact, best_exact = timed(None)
            if best_exact < best:
                auto_note = (
                    f"accel auto-rejected: slower than exact "
                    f"({size * size / best:.0f} vs {size * size / best_exact:.0f}"
                    " rays/s) — reporting the exact path")
                grid, accel = None, False
                img, best = img_exact, best_exact

    n_rays = size * size
    rays_per_s = n_rays / best
    n_chips = jax.device_count()
    result = {
        "metric": f"{_metric_name(impl=impl, dtype=dtype, accel=accel, sampling=sampling)}, {n_chips} chip(s)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / (n_chips * 10_000_000.0), 4),
    }
    if accel_psnr is not None and accel:
        result["accel_psnr_db"] = accel_psnr
        if accel_psnr < 40.0 and not cfg.accel_sample_aabb:
            # Explicit NERF_BENCH_ACCEL=1 below the contract: the fast
            # number is invalid (e.g. a capacity overflow zeroed real
            # samples) — flag it so metric-keyed history cannot ingest it
            # as a real speedup. Placement-changing configs (aabb/probes)
            # are exempt: vs the same-count exact render their PSNR is
            # bounded by stratified-sampling chaos, not error — their
            # quality axis is full_psnr_db (the 64+128 reference), which
            # frontier consumers read directly.
            result["vs_baseline"] = 0.0
            result["error"] = (
                f"accel_psnr_db {accel_psnr} < 40 dB contract — speedup invalid "
                "(capacity overflow / mis-calibrated grid?)"
            )
    if auto_note:
        result["note"] = auto_note
    if student:
        result["student_arch"] = arch_env
    if (nc, nf) != (64, 128) and not student:
        # Quality axis of the rays/s-vs-PSNR frontier: reduced-sample runs
        # (e.g. the reference's own 32+64 wasm preset) report PSNR vs the
        # full-quality 64+128 exact render. Informational, not a guard —
        # the sample-count trade-off is the point of these configs.
        full_cfg = cfg.replace(n_coarse=64, n_fine=128)
        full = render_image(params_c, params_f, camera, size, size,
                            jax.random.fold_in(key, repeats - 1), full_cfg)
        result["full_psnr_db"] = _psnr_db(full, img)
    if ((weights_env or ckpt_env)
            and os.environ.get("NERF_BENCH_TEACHER_PSNR", "1") not in ("0", "false")):
        # Trained-weights runs additionally report quality against the
        # PRETRAINED teacher's full 64+128 exact render at the SAME
        # resolution — the axis a reference user actually compares on
        # (the reference's whole value is its pretrained quality,
        # /root/reference/src/lib.rs:732-742). full_psnr_db above is
        # self-referential (same weights, full samples); this one pins the
        # trained artifact to the ground-truth field.
        from nerf_rs_tpu.config import RenderConfig as _RC

        # Clamp the teacher render's chunk: single-pass presets bench with
        # NERF_BENCH_CHUNK up to 65536, but the TEACHER renders at full
        # 64+128 (192 merged samples), where 16384 rays/chunk is already
        # near the HBM budget — an unclamped chunk can OOM and kill the
        # whole run in exactly the configs this axis targets. And never
        # let a teacher-reference failure void the measured record: emit
        # without teacher_psnr_db instead.
        try:
            teacher_cfg = _RC(n_coarse=64, n_fine=128,
                              ray_chunk=min(cfg.ray_chunk, 16384),
                              impl="pallas" if impl != "xla" else "xla",
                              dtype=dtype)
            teacher = render_image(load_nerf_params(assets / "coarse"),
                                   load_nerf_params(assets / "fine"),
                                   camera, size, size,
                                   jax.random.fold_in(key, repeats - 1),
                                   teacher_cfg)
            result["teacher_psnr_db"] = _psnr_db(teacher, img)
        except Exception as e:
            result["note"] = (result.get("note", "") +
                              f" teacher_psnr_db failed: "
                              f"{type(e).__name__}: {str(e)[:200]}").strip()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
