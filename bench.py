"""Benchmark: flagship single-chip inference latency / throughput.

Measures p50 end-to-end forward+decode latency of srfdet_voxel_nusc_L
(nuScenes LiDAR-only flagship, batch 1) on the available accelerator and
prints ONE JSON line.

vs_baseline: the reference repo publishes NO latency/FPS numbers
(SURVEY.md §6), so two denominators are reported (VERDICT r4 #7):

  - vs_baseline = fps / TARGET_FPS (5.0 f/s): the BASELINE.md working
    estimate of the reference on an A100.  Derivation: the reference's
    per-frame work is the roofline table in tools/roofline.py (~260
    GFLOP forward + the spconv gather/scatter and 900-proposal decoder
    row work); comparable Sparse-R-CNN-style LiDAR detectors at this
    capacity (spconv8x VoxelNet + 5-iteration DII head) publish
    ~4-6 f/s on A100-class GPUs, and the reference's own tooling
    (batch 1 test loader, no TensorRT path) sits in that band.  This
    stays an ESTIMATE until the reference can be run on real hardware
    (its ckpts/ and data/ are empty in this environment).
  - floor_frac = p50_floor / p50_measured where p50_floor = 40 ms is
    the sum of binding per-stage v5e floors from tools/roofline.py
    (35-45 ms band: MXU/HBM floors of the conv stacks + kernel budgets
    of the windowed gathers + NMS + host readback; PERF.md round-4
    roofline section).  floor_frac is the defensible "fraction of
    speed-of-light on THIS chip" number; 1.0 means nothing left.
"""

import json
import os
import time

import numpy as np
import jax

# Persistent compilation cache: the axon remote compiler is slow for large
# programs (a single 262k sort costs ~20s to compile); the flagship forward
# takes many minutes cold.  The cache makes repeat bench runs fast.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TARGET_FPS = 5.0
FLOOR_MS = 40.0      # roofline-derived v5e floor (see module docstring)
WARMUP = 3
ITERS = 20
STREAM_ITERS = 50

# AOT serving artifact (VERDICT r2 #6): serialized StableHLO predict
# program + pickled param arrays in one file.  When present, bench loads
# it instead of importing/tracing the flax model, so first-frame is
# artifact load + compile.  Params are NOT baked as program constants:
# measured on the relay, the baked-params executable is 278 MB vs 87 MB
# and its cache-hit "compile" takes 215-220 s vs ~50 s — executable SIZE
# dominates warm start through the tunnel, so params ride alongside as
# data.  First run writes the artifact; delete the file (or set
# BENCH_AOT=0) to measure the traced path.
AOT_PATH = os.environ.get(
    "BENCH_AOT_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "flagship_aot.jxp"))
USE_AOT = os.environ.get("BENCH_AOT", "1") != "0"


def _fail_fast_if_tunnel_dead():
    """The axon TPU backend rides a localhost relay; if the relay is dead,
    jax device init hangs forever.  Probe the first relay port and exit
    with a diagnostic instead of hanging the driver."""
    if os.environ.get("JAX_PLATFORMS", "axon") == "cpu":
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    import socket
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.settimeout(2.0)
    try:
        s.connect(("127.0.0.1", 8082))
    except OSError:
        import sys
        print("bench.py: TPU tunnel relay (127.0.0.1:8082) is not "
              "listening — jax init would hang. Restore the relay and "
              "re-run.", file=sys.stderr)
        raise SystemExit(3)
    finally:
        s.close()


def _code_fingerprint() -> str:
    """Hash of every source file the predict program traces from — a
    stale AOT artifact must NOT be benched (it silently measures old
    code; bit us in round 4 when a voxelizer change showed zero delta)."""
    import hashlib
    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    files = [os.path.join(root, "__graft_entry__.py"),
             os.path.abspath(__file__)]  # bench.py itself is on the
    # export path — edits to the AOT serialization code must also
    # invalidate the artifact (ADVICE r4).
    for dirpath, _dirs, names in os.walk(os.path.join(root,
                                                      "srfdet3d_tpu")):
        files.extend(os.path.join(dirpath, n) for n in sorted(names)
                     if n.endswith(".py"))
    for f in sorted(files):
        with open(f, "rb") as fh:
            h.update(fh.read())
    # SRFDET_* env knobs change the traced program (gather backend,
    # kernel tile/window sizes...) without touching any source file — a
    # knob flip must also invalidate the artifact (an SRFDET_ONEHOT_WROWS
    # A/B silently re-benched the default-knob artifact this round).
    for k in sorted(os.environ):
        if k.startswith("SRFDET_"):
            h.update(f"{k}={os.environ[k]}".encode())
    return h.hexdigest()


def main():
    _fail_fast_if_tunnel_dead()
    import pickle

    extra = {}
    fingerprint = _code_fingerprint()
    if USE_AOT and os.path.exists(AOT_PATH):
        with open(AOT_PATH, "rb") as f:
            try:
                stale = pickle.load(f).get("code_sha") != fingerprint
            except Exception:
                stale = True
        if stale:
            os.remove(AOT_PATH)
            extra["aot_stale_rebuilt"] = True
    if USE_AOT and os.path.exists(AOT_PATH):
        t0 = time.perf_counter()
        with open(AOT_PATH, "rb") as f:
            art = pickle.load(f)
        exported = jax.export.deserialize(art["exported"])
        # device_put ONCE: leaving the pickled np arrays host-side makes
        # every call re-upload all 92 MB of params through the relay
        # (measured: p50 190 -> 2520 ms)
        variables = jax.device_put(art["variables"])
        batch = jax.device_put(art["batch"])
        extra["load_s"] = round(time.perf_counter() - t0, 2)
        extra["aot"] = True
        call = jax.jit(exported.call)
    else:
        from __graft_entry__ import predict_entry
        predict, (variables, batch) = predict_entry()
        call = jax.jit(predict)
        if USE_AOT:
            # serialize for the next run: program WITHOUT baked params
            # (host-side re-trace only, no device compile)
            try:
                exported = jax.export.export(jax.jit(predict))(
                    variables, batch)
                art = {"exported": exported.serialize(),
                       "variables": jax.device_get(variables),
                       "batch": jax.device_get(batch),
                       "code_sha": fingerprint}
                with open(AOT_PATH, "wb") as f:
                    pickle.dump(art, f, protocol=4)
                extra["aot_written"] = True
            except Exception as e:                     # never fail the bench
                extra["aot_export_error"] = str(e)[:120]

    def run_sync():
        # On the tunneled axon backend block_until_ready returns before the
        # device finishes; a scalar host readback is the only true sync.
        out = call(variables, batch)
        return float(jnp.sum(out["scores"]))

    import jax.numpy as jnp
    t0 = time.perf_counter()
    run_sync()
    compile_s = time.perf_counter() - t0
    if "aot" in extra:
        extra["first_frame_s"] = round(extra["load_s"] + compile_s, 2)

    for _ in range(WARMUP):
        run_sync()

    times = []
    for _ in range(ITERS):
        t = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t)

    p50 = float(np.percentile(times, 50))

    # Throughput: dispatch a stream of frames and sync ONCE at the end —
    # the serving configuration (frames queue on device; the ~28 ms tunnel
    # readback amortizes over the stream instead of taxing every frame).
    run_sync()
    outs = []
    t0 = time.perf_counter()
    for _ in range(STREAM_ITERS):
        outs.append(call(variables, batch))
    s = float(jnp.sum(jnp.stack([jnp.sum(o["scores"]) for o in outs])))
    stream_s = time.perf_counter() - t0
    assert np.isfinite(s)
    fps = STREAM_ITERS / stream_s
    print(json.dumps({
        "metric": "nusc_L_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "floor_frac": round(FLOOR_MS / (p50 * 1000), 3),
        "p50_latency_ms": round(p50 * 1000, 2),
        "throughput_fps": round(fps, 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        **extra,
    }))


if __name__ == "__main__":
    main()
