"""Production-scale accuracy through a TRAINED operator (QUALITY.md §trained).

QUALITY.md's main table uses a weight-free WTA probe; this script closes the
loop the way the reference's DTU evaluation would: TRAIN the real model
(full cascade, rectified construction, the actual training loop) on the
harness's analytic-GT synthetic scene family, then run test-mode inference
at the production shape (1152x1600, 10 neighbors) on HELD-OUT scenes and
report depth error vs the analytic surface — for BOTH constructions through
the same trained weights, so the rectified path's cost is measured where it
matters: at the end of the real pipeline.

Usage (TPU):  python benchmarks/quality_trained.py [--steps 800]
              [--train-size 384 512] [--eval-size 1152 1600] [--cpu]

Writes one markdown table to stdout and a JSON line at the end.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--train-size", type=int, nargs=2, default=[384, 512])
    ap.add_argument("--eval-size", type=int, nargs=2, default=[1152, 1600])
    ap.add_argument("--train-nf", type=int, default=4)
    ap.add_argument("--eval-nf", type=int, default=10)
    ap.add_argument("--scenes", default="plane,sphere,step")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--extra-size", type=int, nargs=2, default=None)
    # the depth-L1 is clamped at 100 mm (reference loss.py:22-25): pixels
    # further off get ZERO depth gradient, so the disparity term must keep
    # contributing — cap the curriculum weight below 1 for short schedules
    # (the reference ramps over its full 216k steps)
    ap.add_argument("--gw-cap", type=float, default=0.5)
    ap.add_argument("--augment", action="store_true",
                    help="Run C: train through the SHIPPED multi-scale "
                         "augmentation (data/augment.py random_scale_and_"
                         "crop, scale 2^U(-0.15,0.5) + crop — the actual "
                         "train.py data path, utils/data_utils.py:6-34)")
    ap.add_argument("--base-size", type=int, nargs=2, default=[768, 1024],
                    help="pre-augmentation render size (scale*base must "
                         "cover the crop: 2^-0.15 * base >= train-size)")
    ap.add_argument("--pool", type=int, default=48,
                    help="augmented-sample pool size: crops are drawn from "
                         "the true augmentation distribution ONCE and kept "
                         "device-resident (per-step host augmentation + "
                         "upload leaks ~25 MB/step in the tunnel client — "
                         "QUALITY.md run-B notes)")
    ap.add_argument("--eval-size2", type=int, nargs=2, default=None,
                    help="second WTA eval size (Run C: evaluate at BOTH "
                         "576x800-class and 1152x1600)")
    ap.add_argument("--pipeline", action="store_true",
                    help="also run depths->multires->fusion with the "
                         "trained operator and score the fused cloud")
    ap.add_argument("--pipeline-size", type=int, nargs=2, default=[576, 800])
    ap.add_argument("--pipeline-views", type=int, default=6)
    ap.add_argument("--params-out", default=None,
                    help="npz to checkpoint trained params into")
    ap.add_argument("--params-in", default=None,
                    help="npz of trained params: skip training, eval only")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from cermvs_tpu.utils.relay import require_tpu_relay

        require_tpu_relay()
        from cermvs_tpu.utils.compile_cache import setup_compilation_cache

        setup_compilation_cache()  # many shape buckets; reuse across runs
        import jax

    import jax.numpy as jnp

    from bench import dtu_ring_poses
    from benchmarks.quality_harness import SCENES, build_scan, depth_error_stats
    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
    from cermvs_tpu.ops.rectify import plan_rectification, plan_union
    from cermvs_tpu.pipeline.inference import InferenceRunner
    from cermvs_tpu.training.optim import fetch_optimizer
    from cermvs_tpu.training.step import init_state, make_train_step

    Ht, Wt = args.train_size
    He, We = args.eval_size
    nf_t, nf_e = args.train_nf, args.eval_nf
    scene_names = args.scenes.split(",")

    # ---- training scans: scene family x texture seeds x sizes, analytic GT
    def render_set(H, W, seeds):
        fx = 2892.0 * W / 1600
        K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float64)
        scans = []
        for name in scene_names:
            for seed in seeds:
                scene = SCENES[name](seed, px_mm=600.0 / fx)
                poses = dtu_ring_poses(nf_t + 1,
                                       np.random.RandomState(10 + seed))
                images, gts = build_scan(scene, poses, K, H, W)
                scans.append({
                    "images": images[None].astype(np.float32),
                    "depths": gts[None].astype(np.float32),
                    "poses": poses[None].astype(np.float32),
                    "intrinsics": np.tile(K.astype(np.float32),
                                          (1, nf_t + 1, 1, 1)),
                })
        return scans

    if args.augment:
        # Run C: render base scans ABOVE the crop size, then draw a pool of
        # samples through the SHIPPED augmentation — every pool entry is one
        # (scale, crop) draw of random_scale_and_crop on a base scan, so the
        # operator trains across scales exactly as configs/train_*.gin does
        from cermvs_tpu.data.augment import random_scale_and_crop

        Hb, Wb = args.base_size
        assert 2 ** (-0.15) * Hb >= Ht and 2 ** (-0.15) * Wb >= Wt, \
            "base render must cover the crop at the smallest draw"
        base_scans = render_set(Hb, Wb, (0, 1, 2))
        arng = np.random.RandomState(42)
        train_scans = []
        for i in range(args.pool):
            s = base_scans[i % len(base_scans)]
            im, dp, K = random_scale_and_crop(
                s["images"][0], s["depths"][0], s["intrinsics"][0],
                crop_size=(Ht, Wt), rng=arng)
            train_scans.append({
                "images": im[None].astype(np.float32),
                "depths": dp[None].astype(np.float32),
                "poses": s["poses"],
                "intrinsics": K[None].astype(np.float32),
            })
        print(f"augmented pool: {args.pool} draws of random_scale_and_crop "
              f"({Hb}x{Wb} -> {Ht}x{Wt}, nf{nf_t})", flush=True)
    else:
        train_scans = render_set(Ht, Wt, (0, 1, 2))
    if args.extra_size:
        # a second, larger resolution narrows the train->eval texture-
        # frequency gap (one extra compiled step per shape bucket)
        He2, We2 = args.extra_size
        train_scans += render_set(He2, We2, (3,))
    print(f"rendered {len(train_scans)} training scans "
          f"({Ht}x{Wt}{' + ' + str(args.extra_size) if args.extra_size else ''},"
          f" nf{nf_t})", flush=True)

    def scan_plan(s):
        H, W = s["images"].shape[2:4]
        K4 = np.asarray(s["intrinsics"][0], np.float64).copy()
        K4[:, :2] /= 4.0
        return plan_rectification(s["poses"][0].astype(np.float64), K4,
                                  H // 4, W // 4)

    # one union plan per shape bucket (shapes are part of the compiled step)
    plans = {}
    for s in train_scans:
        shp = s["images"].shape[2:4]
        plans.setdefault(shp, []).append(scan_plan(s))
    plans = {shp: plan_union(ps) for shp, ps in plans.items()}
    plan = plans[(Ht, Wt)]
    model_kw = ({"volume_fn": make_rectified_volume_fn(plan)}
                if plan.ok else {})
    print(f"train plan ok={plan.ok} twopass={getattr(plan, 'twopass', None)}",
          flush=True)

    model = RAFT(hyp_chunk=8, **model_kw)
    tx, _ = fetch_optimizer(num_steps=args.steps, lr=args.lr)
    dev = {k: jnp.asarray(v) for k, v in train_scans[0].items()}
    state = init_state(model, tx, jax.random.PRNGKey(0), dev)
    # params are architecture-only: one state serves every shape bucket's
    # step (each bucket gets its own plan-matched volume_fn)
    steps_by_shape = {}
    for shp, pl in plans.items():
        kw = {"volume_fn": make_rectified_volume_fn(pl)} if pl.ok else {}
        steps_by_shape[shp] = make_train_step(RAFT(hyp_chunk=8, **kw), tx,
                                              donate=False)

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    if args.params_in:
        data = np.load(args.params_in, allow_pickle=True)
        flat = list(data["flat"])
        treedef = jax.tree_util.tree_structure(state.params)
        params = {"params": jax.tree_util.tree_unflatten(treedef, flat)}
        print(f"loaded params from {args.params_in}; skipping training",
              flush=True)
    else:
        # upload each scan ONCE and reuse when they fit next to the step's
        # temps: per-step uploads leak host buffers in the tunnel client
        # (~27 MB/step; a 2000-step run wedged at 54 GB RSS).  At full-crop
        # sizes the resident scans OOM the 16 GB chip instead — keep them
        # host-side there and accept the bounded leak.
        scan_bytes = sum(v.nbytes for sc in train_scans for v in sc.values())
        img_bytes = sum(sc["images"].nbytes for sc in train_scans)
        if scan_bytes < 1.2e9:
            mode = "device"
        elif scan_bytes - img_bytes // 2 < 1.2e9:
            # bf16-resident images (texture rounding ~0.4%: irrelevant for
            # training; the model computes in bf16 anyway) bring full-crop
            # scan sets under the HBM budget — avoiding both the per-step
            # tunnel-client leak (OOM-killed a 700-step full-crop run at
            # 126 GB RSS) and the device OOM of f32-resident scans
            mode = "device-bf16"
        else:
            mode = "host"
        print(f"scans {mode} ({scan_bytes/1e9:.2f} GB f32)", flush=True)
        if mode == "host":
            dev_scans = train_scans
        else:
            cast = (lambda k, v: jnp.asarray(v).astype(jnp.bfloat16)
                    if mode == "device-bf16" and k == "images"
                    else jnp.asarray(v))
            dev_scans = [{k: cast(k, v) for k, v in s.items()}
                         for s in train_scans]
        for i in range(args.steps):
            j = rng.randint(len(dev_scans))
            batch = (dev_scans[j] if mode != "host" else
                     {k: jnp.asarray(v) for k, v in dev_scans[j].items()})
            gw = min(args.gw_cap, i / max(args.steps, 1))
            step = steps_by_shape[train_scans[j]["images"].shape[2:4]]
            state, metrics = step(state, batch, gw)
            if i % 100 == 0 or i == args.steps - 1:
                print(f"step {i}: loss={float(metrics['loss']):.4f} "
                      f"depth_err="
                      f"{float(metrics.get('mean_depth_error', np.nan)):.2f} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            if args.params_out and (i % 400 == 399 or i == args.steps - 1):
                flat = [np.asarray(x) for x in
                        jax.tree_util.tree_leaves(
                            jax.device_get(state.params))]
                np.savez(args.params_out, flat=np.asarray(
                    flat, dtype=object), step=i)
                print(f"  saved params at step {i}", flush=True)
        params = {"params": jax.device_get(state.params)}

    # ---- held-out eval, both constructions, at one or two sizes (Run C
    # evaluates at BOTH 576x800-class and 1152x1600 to measure the scale
    # gap the augmentation is supposed to close)
    results = {}
    eval_sizes = [(He, We)] + ([tuple(args.eval_size2)]
                               if args.eval_size2 else [])
    for Hx, Wx in eval_sizes:
        fx_e = 2892.0 * Wx / 1600
        Ke = np.array([[fx_e, 0, Wx / 2], [0, fx_e, Hx / 2], [0, 0, 1]],
                      np.float64)
        print(f"| scene ({Hx}x{Wx}) | construction | median mm | p90 mm "
              f"| <2mm |")
        print("|---|---|---|---|---|")
        for name in scene_names:
            scene = SCENES[name](7, px_mm=600.0 / fx_e)  # held-out texture
            poses = dtu_ring_poses(nf_e + 1, np.random.RandomState(99))
            images, _ = build_scan(scene, poses, Ke, Hx, Wx)
            K4e = Ke.copy()
            K4e[:2] /= 4.0
            gt4 = scene.depth(poses[0].astype(np.float64), K4e, Hx // 4,
                              Wx // 4)
            intr = np.tile(Ke.astype(np.float32), (nf_e + 1, 1, 1))
            for construction in ("exact", "rectified"):
                runner = InferenceRunner(params, construction=construction,
                                         hyp_chunk=8)
                t1 = time.perf_counter()
                depth = runner(images.astype(np.float32),
                               poses.astype(np.float32), intr, 1.0)
                stats = depth_error_stats(np.asarray(depth), gt4)
                stats["seconds"] = round(time.perf_counter() - t1, 2)
                tag = ("" if (Hx, Wx) == (He, We) else f"_{Hx}x{Wx}")
                results[f"{name}_{construction}{tag}"] = stats
                print(f"| {name} | {construction} | "
                      f"{stats['median_mm']:.3f} | "
                      f"{stats['p90_mm']:.3f} | {stats['frac_lt_2mm']:.3f} |",
                      flush=True)
    line = {"steps": args.steps, "train": f"{Ht}x{Wt}",
            "eval": f"{He}x{We}", "augment": bool(args.augment), **{
                k: round(v["median_mm"], 3) for k, v in results.items()}}

    if args.pipeline:
        # full pipeline with the TRAINED operator: depths at rescale 1 and 2
        # through the real file contract -> multires -> adaptive fusion ->
        # cloud vs the analytic surface (the reference's demo.py:26-62
        # contract, scored in closed form)
        Hp, Wp = args.pipeline_size
        print("| scene | points | accuracy mm | completeness mm |")
        print("|---|---|---|---|")
        for name in scene_names:
            r = eval_pipeline_trained(
                params, name, Hp, Wp, n_views=args.pipeline_views,
                nf=args.pipeline_views - 1,
                out_dir=f"results/quality_trained/{name}")
            line[f"{name}_pipeline_acc"] = round(r["accuracy_mm"], 3)
            line[f"{name}_pipeline_comp"] = round(r["completeness_mm"], 3)
            print(f"| {name} | {r['n_points']} | {r['accuracy_mm']:.3f} | "
                  f"{r['completeness_mm']:.3f} |", flush=True)
        if "sphere" in scene_names:
            # round-3 VERDICT #4: sphere completeness under the default
            # glb=0.25 reflects aggressive masking — sweep looser adaptive
            # targets (reported, NOT gated) reusing the written depths
            for glb in (0.4, 0.6):
                # tot_iter=8: the default 4-iteration search is too coarse
                # to land near a looser target (0.4 and 0.6 take the same
                # path and produce identical clouds)
                r = eval_pipeline_trained(
                    params, "sphere", Hp, Wp, n_views=args.pipeline_views,
                    nf=args.pipeline_views - 1,
                    out_dir="results/quality_trained/sphere", glb=glb,
                    reuse_depths=True, tot_iter=8)
                line[f"sphere_comp_glb{glb}"] = round(
                    r["completeness_mm"], 3)
                print(f"| sphere glb={glb} | {r['n_points']} | "
                      f"{r['accuracy_mm']:.3f} | {r['completeness_mm']:.3f} "
                      f"| (reported, not gated)", flush=True)

    print(json.dumps(line))


def eval_pipeline_trained(params, scene_name, H, W, n_views, nf, out_dir,
                          construction="auto", hyp_chunk=8, glb=0.25,
                          reuse_depths=False, tot_iter=4):
    """Trained-model depths (rescale 1 and 2) -> multires -> fusion ->
    accuracy/completeness vs the analytic surface.  Mirrors
    quality_harness.eval_pipeline but through the REAL InferenceRunner."""
    from pathlib import Path

    from bench import dtu_ring_poses
    from benchmarks.quality_harness import SCENES, _read_ply_xyz, build_scan
    from cermvs_tpu.io.pfm import write_pfm
    from cermvs_tpu.pipeline.fusion import fusion
    from cermvs_tpu.pipeline.inference import InferenceRunner
    from cermvs_tpu.pipeline.multires import multires

    fx1 = 2892.0 * W / 1600
    scene = SCENES[scene_name](11, px_mm=600.0 / (2 * fx1))  # held-out seed
    out = Path(out_dir)
    (out / "depths").mkdir(parents=True, exist_ok=True)
    poses = dtu_ring_poses(n_views, np.random.RandomState(1))
    runner = InferenceRunner(params, construction=construction,
                             hyp_chunk=hyp_chunk)

    scans = {}
    for rescale, (Hr, Wr) in ((1, (H, W)), (2, (2 * H, 2 * W))):
        K = np.array([[2892.0 * Wr / 1600, 0, Wr / 2],
                      [0, 2892.0 * Wr / 1600, Hr / 2], [0, 0, 1]], np.float64)
        images, _ = build_scan(scene, poses, K, Hr, Wr)
        scans[rescale] = (K, images)
        if reuse_depths:  # glb re-evals reuse the written depth maps
            continue
        for ref in range(n_views):
            order = [ref] + [j for j in range(n_views) if j != ref][:nf]
            depth = runner(
                images[order].astype(np.float32),
                poses[order].astype(np.float32),
                np.tile(K.astype(np.float32), (len(order), 1, 1)), 1.0)
            write_pfm(out / "depths" / f"{ref}_scale{rescale}_nf{nf}.pfm",
                      np.asarray(depth, np.float32))

    if not reuse_depths:
        multires(out, suffix1=f"_nf{nf}", suffix2=f"_nf{nf}")

    class _Loader:
        num_frames = nf

        def __len__(self):
            return n_views

        def __iter__(self):
            K, images = scans[1]
            for ref in range(n_views):
                order = [ref] + [j for j in range(n_views) if j != ref][:nf]
                yield (np.clip(images[order] + 128.0, 0, 255),
                       poses[order],
                       np.tile(K.astype(np.float32), (len(order), 1, 1)),
                       [str(j) for j in order], 1.0)

    ply = fusion(_Loader(), out, rescale=2, suffix=f"_nf{nf}_nf{nf}_th0.02",
                 glb=glb, tot_iter=tot_iter)

    verts = _read_ply_xyz(ply)
    rng = np.random.RandomState(2)
    acc = (float(np.median(scene.surface_distance(verts)))
           if len(verts) else float("nan"))
    comp = float("nan")
    if len(verts):
        surf = scene.surface_samples(20000, rng)
        sub = verts[rng.choice(len(verts), min(len(verts), 20000),
                               replace=False)]
        d2 = ((surf[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
        comp = float(np.median(np.sqrt(d2.min(1))))
    return {"n_points": int(len(verts)), "accuracy_mm": acc,
            "completeness_mm": comp, "ply": str(ply)}


if __name__ == "__main__":
    main()
