"""Benchmark: depth-maps/sec/chip on a DTU-shaped inference workload.

Runs the flagship cascaded-RAFT forward (test mode) on synthetic inputs shaped
like the reference's DTU low-res pass (num_frames=10 neighbors + ref at
1152x1600, cascade (64,64,8)/(44,320,8) — ``configs/inference_DTU.gin`` +
``core/raft.py:14``) and reports throughput, then runs one DTU-shaped
training step (batch 2, 1056x1440 crop, rectified construction) so the
driver artifact covers training too.

Prints ONE JSON line.  Headline fields {"metric", "value", "unit",
"vs_baseline"} are the inference number; extra fields carry MFU/FLOPs
(XLA cost model, ``cermvs_tpu/utils/flops.py``) and the train-step metric.
Pass ``--no-train`` to skip the training section.

Baseline: the reference publishes no per-view latency (BASELINE.md) — the
``do_report`` timer at ``/root/reference/inference.py:52-56`` is the only
instrument.  We use 0.5 depth-maps/sec (2 s/view on the reference's RTX 3090
class hardware for this configuration) as the comparison point; vs_baseline =
ours / 0.5.  That 0.5 is an ASSUMPTION, not a measurement — the JSON says so
(``baseline_note``).  The training baseline IS derived from published data:
216,090 steps / 6 days on 2 GPUs => 0.21 steps/s/chip (BASELINE.md).

Camera geometry mirrors the DTU rig (cameras on a ~600 mm sphere looking at
the object — mostly-lateral pairwise baselines), so the default
``--construction auto`` exercises the rectified construction (fast path when
the host planner accepts the scene, exact otherwise; ``--construction
exact`` forces the gather-based path).  Measured on this scene: rectified
1.47 maps/s vs exact 1.02 (stage-shared rectification features, zero-slab
stage-0 diagonal-band kernel, bf16 segment sums — see BENCH_NOTES.md).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MAPS_PER_SEC = 0.5

# DTU low-res inference shape (1200x1600 images, cropped to stride-multiple)
H, W = 1152, 1600
NUM_FRAMES = 10  # neighbors; total views = 11


def dtu_ring_poses(n, rs):
    """World-to-camera poses of a DTU-like rig: cameras on a sphere of
    radius ~600 mm looking at the object at the origin (the DTU robot-arm
    geometry — mostly lateral pairwise baselines of 20-100 mm)."""
    poses = np.zeros((n, 4, 4), np.float32)
    for i in range(n):
        ang = 0.06 * ((i + 1) // 2) * (1 if i % 2 else -1)
        elev = 0.04 * (i % 3 - 1)
        eye = 600.0 * np.array(
            [np.sin(ang), np.sin(elev), -np.cos(ang) * np.cos(elev)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0.0, 1.0, 0.0])
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd]).astype(np.float32)
        poses[i, :3, :3] = R
        poses[i, :3, 3] = -R @ eye.astype(np.float32)
        poses[i, 3, 3] = 1.0
    return poses


def main():
    from cermvs_tpu.utils.relay import require_tpu_relay, wait_for_tpu_relay

    # the relay flaps for ~1-2 min between jobs; give it time before the
    # hard fail (jax.devices() hangs, not errors, when it is down)
    wait_for_tpu_relay(max_wait=300.0)
    require_tpu_relay()
    from cermvs_tpu.utils.compile_cache import setup_compilation_cache

    # compile-time only (steady-state timings are unaffected); spares the
    # round-end driver run the 5-minute cold compiles per shape bucket
    setup_compilation_cache()

    import jax
    import jax.numpy as jnp
    from cermvs_tpu.models.raft import RAFT

    small = "--small" in sys.argv
    construction = "auto"
    if "--construction" in sys.argv:
        construction = sys.argv[sys.argv.index("--construction") + 1]
    h, w, n = (256, 320, 4) if small else (H, W, NUM_FRAMES + 1)

    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(1, n, h, w, 3) * 255).astype(np.float32))
    K = np.array([[2892.0 * w / 1600, 0, w / 2], [0, 2892.0 * w / 1600, h / 2],
                  [0, 0, 1]], np.float32)
    intrinsics = jnp.asarray(np.tile(K, (1, n, 1, 1)))
    poses = jnp.asarray(dtu_ring_poses(n, np.random.RandomState(1))[None])
    scale = jnp.ones((1,), jnp.float32)

    volume_fn = None
    if construction in ("rectified", "auto"):
        import dataclasses

        from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
        from cermvs_tpu.ops.rectify import plan_rectification

        K4 = np.asarray(intrinsics).copy()
        K4[..., :2, :] /= 4
        plan = plan_rectification(np.asarray(poses), K4, h // 4, w // 4)
        # --warp quad|twopass: force the warp impl for A/B timing (default:
        # the plan's own gate decision)
        if "--warp" in sys.argv:
            warp = sys.argv[sys.argv.index("--warp") + 1]
            plan = dataclasses.replace(plan, twopass=(warp == "twopass"))
        if plan.ok:
            volume_fn = make_rectified_volume_fn(plan)
            print(f"construction: rectified (plan {plan.h_r}x{plan.w_r} "
                  f"s_max={plan.s_max} twopass={plan.twopass})",
                  file=sys.stderr)
        elif construction == "rectified":
            raise RuntimeError(f"rectified plan rejected: {plan.reason}")

    model = RAFT(test_mode=True, hyp_chunk=8, volume_fn=volume_fn)
    # jit the init: eager flax init dispatches each op through the tunnel
    # (~29 ms/op, DEVNOTES) — minutes at this graph size
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, poses,
                                 intrinsics, scale)

    # AOT-compile: the compiled executable both runs the timing loop and
    # reports its static HBM footprint (device.memory_stats() returns {}
    # through the axon relay, so runtime peaks are unavailable — the
    # compiled program's argument+output+temp sizes ARE the planned peak)
    fwd_l = jax.jit(
        lambda p, im, po, k, s: model.apply(p, im, po, k, s)).lower(
            params, images, poses, intrinsics, scale)
    fwd_c = fwd_l.compile()
    ma = fwd_c.memory_analysis()
    fwd = lambda *a: fwd_c(*a)

    # warmup (host fetch forces real completion through the
    # remote-execution path — block_until_ready alone has proven unreliable
    # on tunneled backends)
    out = fwd(params, images, poses, intrinsics, scale)
    _ = np.asarray(out)

    # software-pipelined timing, exactly like the production driver
    # (pipeline/inference.py dispatches batch i+1 before fetching batch i):
    # jax's async dispatch overlaps the ~25-30 ms tunnel round-trip with
    # device compute instead of serializing it into every map
    iters = 3 if small else 5
    t0 = time.perf_counter()
    pending = fwd(params, images, poses, intrinsics, scale)
    for _ in range(iters - 1):
        nxt = fwd(params, images, poses, intrinsics, scale)
        _ = np.asarray(pending)
        pending = nxt
    _ = np.asarray(pending)
    dt = (time.perf_counter() - t0) / iters

    maps_per_sec = 1.0 / dt

    from cermvs_tpu.utils.flops import device_peak_flops, flops_of, mfu
    from cermvs_tpu.utils.memory import device_memory_stats

    def peak_hbm_gb():
        return round(max((s["peak_bytes_in_use_mb"]
                          for s in device_memory_stats().values()),
                         default=0.0) / 1024, 2)

    # FLOP counting happens on the CPU backend's HLO cost model (the axon
    # client exposes none); the Pallas epiband kernel cannot lower for CPU,
    # so count on a twin model using the pure-XLA "oracle" builder — same
    # matmul structure, a faithful count of the executed math
    fl_model = model
    if volume_fn is not None:
        from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn

        fl_model = RAFT(test_mode=True, hyp_chunk=8,
                        volume_fn=make_rectified_volume_fn(plan,
                                                           impl="oracle"))
    fwd_fl = jax.jit(lambda p, im, po, k, s: fl_model.apply(p, im, po, k, s))
    fwd_flops = flops_of(fwd_fl, params, images, poses, intrinsics, scale)
    result = {
        "metric": f"depth-maps/sec/chip (DTU {h}x{w} nf{n-1} synthetic)",
        "value": round(maps_per_sec, 4),
        "unit": "maps/s",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC, 3),
        "baseline_note": "0.5 maps/s is an ASSUMED RTX-3090 figure (the "
                         "reference publishes no latency); train baseline "
                         "0.21 steps/s/chip is derived from its README",
        "device_kind": jax.devices()[0].device_kind,
        # planned HBM peak of the compiled forward (args+outputs+temps;
        # covers the cost-volume build high-water mark — the
        # inference.py:52-56/utils/memory.py parity point).  Runtime
        # memory_stats() is empty through the axon relay.
        "peak_hbm_gb": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes) / 2 ** 30, 2),
    }
    live = peak_hbm_gb()
    if live:
        result["peak_hbm_gb_runtime"] = live
    if fwd_flops is not None:
        result["inference_gflops_per_map"] = round(fwd_flops / 1e9, 1)
        m = mfu(fwd_flops, dt)
        if m is not None:
            result["inference_mfu"] = round(m, 4)
            result["peak_tflops_bf16"] = device_peak_flops() / 1e12

    if "--no-train" not in sys.argv and not small:
        # emit the inference result FIRST (a crash/timeout in the training
        # section must not cost the whole artifact), then the combined line
        print(json.dumps(result), flush=True)
        try:
            result.update(train_bench())
        except Exception as e:  # keep the inference artifact on any failure
            result["train_error"] = repr(e)[:200]

    if "--no-shapes" not in sys.argv and not small:
        # production shapes beyond the scale-1 headline: DTU scale-2 and the
        # TNT nf15/nf25 passes (demo.py:26-62's full contract).  Each row
        # lands incrementally so a late timeout keeps earlier rows.
        print(json.dumps(result), flush=True)
        result["shapes"] = []
        for sh, sw, nf, note in [(2304, 3200, 10, "DTU scale-2"),
                                 (1088, 1920, 15, "TNT low-res nf15"),
                                 (1088, 1920, 25, "TNT low-res nf25")]:
            try:
                row = shape_bench(sh, sw, nf, construction)
                row["note"] = note
            except Exception as e:
                row = {"shape": f"{sh}x{sw} nf{nf}", "note": note,
                       "error": repr(e)[:200]}
            result["shapes"].append(row)
            print(json.dumps(result), flush=True)

    print(json.dumps(result))


def shape_bench(h, w, nf, construction, repeats=2, compare_exact=True):
    """Throughput at one (H, W, num_frames) inference shape, through the
    SAME InferenceRunner dispatch path production uses (plan gating, memory
    budget, mixed fallback).

    Timed like the headline (round-3 VERDICT #1): images live on DEVICE in
    bf16 (uploaded once — the runner passes bf16 jax arrays through), calls
    are software-pipelined (dispatch i+1 before fetching i), and the timed
    block repeats ``repeats`` times with an adaptive per-block iteration
    count.  The row reports the min block average (the device-compute
    number), the median, and the run-to-run spread — earlier iters=1
    synchronous rows swung up to 3x on tunnel noise and re-uploaded
    0.2-0.5 GB of images per call.

    When the measured path is rectified, also times the exact construction
    at the same shape (``compare_exact``): TNT-class plans carry much wider
    per-view epipolar windows than DTU's (mean view_s_max 2155 px vs 1299
    at the same planner settings), so the per-shape winner is an empirical
    question — the row reports both and headlines the faster one.
    """
    import jax
    import jax.numpy as jnp

    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.pipeline.inference import InferenceRunner

    n = nf + 1
    rng = np.random.RandomState(2)
    images = (rng.rand(n, h, w, 3) * 255).astype(np.float32)
    K = np.array([[2892.0 * w / 1600, 0, w / 2],
                  [0, 2892.0 * w / 1600, h / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (n, 1, 1))
    poses = dtu_ring_poses(n, None)
    # device-resident bf16 images, uploaded ONCE (production overlaps the
    # per-view upload with compute via the driver's prep prefetcher; the
    # row isolates device throughput)
    images_dev = jnp.asarray(images.astype(jnp.bfloat16))
    jax.block_until_ready(images_dev)

    model = RAFT(test_mode=True, hyp_chunk=8)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(images[None, :2]),
        jnp.asarray(poses[None, :2]), jnp.asarray(intr[None, :2]),
        jnp.ones((1,), jnp.float32))

    def measure(constr):
        """(min s/view, median s/view, spread, resolved path)."""
        runner = InferenceRunner(params, construction=constr, hyp_chunk=8)
        t0 = time.perf_counter()
        _ = runner(images_dev, poses, intr, 1.0)  # compile + warmup
        warm = time.perf_counter() - t0
        _ = runner(images_dev, poses, intr, 1.0)  # steady-state probe
        dt1 = time.perf_counter() - t0 - warm
        iters = max(2, min(4, int(20.0 / max(dt1, 0.5))))
        block = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            pending = runner.submit(images_dev, poses, intr, 1.0)
            for _ in range(iters - 1):
                nxt = runner.submit(images_dev, poses, intr, 1.0)
                _ = runner.finalize(pending)
                pending = nxt
            _ = runner.finalize(pending)
            block.append((time.perf_counter() - t0) / iters)
        resolved = runner._last_path  # "exact" | "rectified" | "mixed"
        spread = (max(block) - min(block)) / max(min(block), 1e-9)
        return min(block), float(np.median(block)), spread, resolved

    try:
        dt, dt_med, spread, resolved = measure(construction)
    except Exception as e:
        if construction == "exact":
            raise
        print(f"[shape_bench {h}x{w} nf{nf}] {type(e).__name__}: "
              f"{repr(e)[:200]}; retrying with exact construction",
              file=sys.stderr)
        dt, dt_med, spread, resolved = measure("exact")
    row = {"shape": f"{h}x{w} nf{nf}", "maps_per_sec": round(1.0 / dt, 4),
           "seconds_per_view": round(dt, 3),
           "seconds_per_view_median": round(dt_med, 3),
           "spread_pct": round(100 * spread, 1), "construction": resolved}
    if compare_exact:
        # time the OTHER construction too (auto's work-ratio gate picks a
        # winner per shape; the row carries the evidence for that choice)
        other = "exact" if resolved in ("rectified", "mixed") else "rectified"
        try:
            dt_o, dt_o_med, spread_o, resolved_o = measure(other)
            if resolved_o == resolved:
                # the forced-other runner fell back (plan rejected / memory
                # budget / compile failure handled upstream): annotating,
                # NOT labeling an exact-path time as rectified
                row["compare_skipped"] = (f"requested {other}, resolved "
                                          f"{resolved_o}")
            else:
                row[f"seconds_per_view_{resolved_o}"] = round(dt_o, 3)
                if dt_o < dt:
                    row.update(maps_per_sec=round(1.0 / dt_o, 4),
                               seconds_per_view=round(dt_o, 3),
                               seconds_per_view_median=round(dt_o_med, 3),
                               spread_pct=round(100 * spread_o, 1),
                               construction=resolved_o)
                    row[f"seconds_per_view_{resolved}"] = round(dt, 3)
                    del row[f"seconds_per_view_{resolved_o}"]
        except Exception as e:  # keep the primary measurement on any failure
            row["compare_error"] = repr(e)[:120]
    return row


def train_bench(batch=2, H=1056, W=1440, N=11):
    """One DTU-shaped training step (rectified construction), timed; returns
    metric fields for the combined JSON line.  Mirrors bench_train.py."""
    import jax
    import jax.numpy as jnp

    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
    from cermvs_tpu.ops.rectify import plan_rectification, plan_union
    from cermvs_tpu.training.optim import fetch_optimizer
    from cermvs_tpu.training.step import init_state, make_train_step
    from cermvs_tpu.utils.flops import flops_of, mfu

    rng = np.random.RandomState(0)
    K = np.array([[2892.0 * W / 1600, 0, W / 2], [0, 2892.0 * W / 1600, H / 2],
                  [0, 0, 1]], np.float32)
    poses = np.stack([dtu_ring_poses(N, np.random.RandomState(1 + b))
                      for b in range(batch)])
    batch_data = {
        "images": jnp.asarray((rng.rand(batch, N, H, W, 3) * 255).astype(np.float32)),
        "depths": jnp.asarray((rng.rand(batch, N, H, W) * 400 + 400).astype(np.float32)),
        "poses": jnp.asarray(poses),
        "intrinsics": jnp.asarray(np.tile(K, (batch, N, 1, 1))),
    }
    K4 = np.tile(K, (N, 1, 1)).copy()
    K4[:, :2] /= 4.0
    plan = plan_union([plan_rectification(poses[b], K4, H // 4, W // 4)
                       for b in range(batch)])
    model_kw = {"volume_fn": make_rectified_volume_fn(plan)} if plan.ok else {}
    tag = " rectified" if plan.ok else " exact"

    model = RAFT(hyp_chunk=8, **model_kw)
    tx, _ = fetch_optimizer(num_steps=1000)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch_data)
    step_l = make_train_step(model, tx, donate=False).lower(
        state, batch_data, 0.5)
    step_c = step_l.compile()
    tma = step_c.memory_analysis()
    step = lambda *a: step_c(*a)

    state, metrics = step(state, batch_data, 0.5)
    _ = float(metrics["loss"])
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data, 0.5)
        _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    out = {
        "train_metric": f"train steps/s/chip (DTU {H}x{W} b{batch} nf{N-1}{tag})",
        "train_value": round(1.0 / dt, 4),
        "train_unit": "steps/s",
        "train_vs_baseline": round(1.0 / dt / 0.21, 3),
        "train_peak_hbm_gb": round(
            (tma.argument_size_in_bytes + tma.output_size_in_bytes
             + tma.temp_size_in_bytes) / 2 ** 30, 2),
    }
    # FLOPs via the pure-XLA oracle builder (the Pallas kernel cannot lower
    # on the CPU cost-model backend; same matmul structure)
    fl_step = step
    if plan.ok:
        fl_model = RAFT(hyp_chunk=8,
                        volume_fn=make_rectified_volume_fn(plan,
                                                           impl="oracle"))
        fl_step = make_train_step(fl_model, tx, donate=False)
    step_flops = flops_of(fl_step, state, batch_data, 0.5)
    if step_flops is not None:
        out["train_gflops_per_step"] = round(step_flops / 1e9, 1)
        m = mfu(step_flops, dt)
        if m is not None:
            out["train_mfu"] = round(m, 4)
    return out


if __name__ == "__main__":
    main()
