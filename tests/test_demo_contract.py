"""Day-one real-data drill: the REAL CLI contract on a reference-layout scan.

Writes a DTU-layout scan directory (``Rectified/scan3/rect_*_3_r5000.png``
images + ``Cameras/{i:08d}_cam.txt`` + ``Cameras/pair.txt`` — the on-disk
layout ``datasets/dtu.py:213-241`` consumes) from a synthetic renderer,
trains a small operator on the same scene family, then runs the SHIPPED
entry points exactly as a user would the moment real data lands
(``/root/reference/demo.py:26-43``):

    python inference.py -g inference_DTU   (rescale 1 and 2)
    python multires.py  -g inference_DTU
    python fusion.py    -g inference_DTU

via the gin configs, asserting the PFM naming contract
(``{ref}_scale{rescale}_nf{num_frames}.pfm``, ``inference.py:59``), the
multires merge suffix (``_nf10_nf10_th0.02``), and a non-empty fused PLY
near the true surface.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

# scene family: fronto-parallel textured plane, lateral camera line — the
# scale regime of the tiny test cascade ((16, 0.5, 3): inverse depths up to
# 0.075, tests/test_learning.py)
FOCAL = 60.0
H, W = 48, 64
Z_SCAN = 28.0
N_CAMS = 49   # DTUTest reads all 49 DTU cam files (datasets/dtu.py:166-169)
N_IMGS = 12   # images present on disk; fusion loads the WHOLE scan (the
              # reference fans out fusion per scan, never per view subset)
SPACING = 0.55
CASCADE = "((16, 0.5, 3),)"


def _texture_coefs(rng, n=10):
    return {
        "a": rng.uniform(20, 45, (3, n)),
        "fx": rng.uniform(0.3, 1.6, (3, n)),
        "fy": rng.uniform(0.3, 1.6, (3, n)),
        "ph": rng.uniform(0, 2 * np.pi, (3, n)),
    }


def _render(coefs, cam_x, Z, h=H, w=W, rescale=1):
    """Procedural world-plane texture seen from a camera at (cam_x, 0, 0):
    view-consistent by construction (no warp boundary artifacts)."""
    f = FOCAL * rescale
    cx, cy = w * rescale / 2, h * rescale / 2
    u, v = np.meshgrid(np.arange(w * rescale), np.arange(h * rescale),
                       indexing="xy")
    xw = (u - cx) * Z / f + cam_x
    yw = (v - cy) * Z / f
    img = np.zeros((h * rescale, w * rescale, 3), np.float32)
    for c in range(3):
        img[..., c] = 127.5 + sum(
            coefs["a"][c, k] * np.sin(coefs["fx"][c, k] * xw
                                      + coefs["fy"][c, k] * yw
                                      + coefs["ph"][c, k])
            for k in range(coefs["a"].shape[1]))
    return np.clip(img, 0, 255).astype(np.uint8).astype(np.float32)


def _write_scan(root, coefs):
    """Reference-layout DTU scan directory."""
    import cv2

    cams = root / "Cameras"
    imgs = root / "Rectified" / "scan3"
    cams.mkdir(parents=True)
    imgs.mkdir(parents=True)
    xs = [SPACING * (i - N_CAMS // 2) for i in range(N_CAMS)]
    K = np.array([[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]])
    for i, x in enumerate(xs):
        E = np.eye(4)
        E[0, 3] = -x  # w2c of a camera centered at (x, 0, 0)
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.12g}" for v in row) for row in E]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.12g}" for v in row) for row in K]
        # aux row: depth_min interval (datasets consume row 11 for min-depth
        # conventions; DTUTest ignores it)
        lines += ["", f"{Z_SCAN * 0.7:.6g} {0.1:.6g}"]
        (cams / f"{i:08d}_cam.txt").write_text("\n".join(lines) + "\n")
        if i < N_IMGS:
            cv2.imwrite(str(imgs / f"rect_{i + 1:03d}_3_r5000.png"),
                        _render(coefs, x, Z_SCAN).astype(np.uint8))
    # pair.txt: top-10 neighbors by camera distance (MVSNet format)
    out = [str(N_IMGS)]
    for i in range(N_IMGS):
        nb = sorted(range(N_IMGS), key=lambda j: (abs(j - i), j))[1:11]
        out.append(str(i))
        out.append(f"{len(nb)} "
                   + " ".join(f"{j} {100.0 - abs(j - i)}" for j in nb))
    (cams / "pair.txt").write_text("\n".join(out) + "\n")


def _train_operator(ckpt_dir, rng, coefs):
    """Small operator trained on the scan's scene family (random plane
    depths + baselines, same renderer) — enough signal that inference
    depths are geometrically consistent across views.

    Tiny-budget training is BIMODAL across runs (XLA CPU thread
    scheduling perturbs fp sums enough to pick different basins: observed
    scan-eval medians 27.5 and 40.8 from the same seeds) — so the trained
    operator is VALIDATED in-process on one scan view and retrained on a
    fresh seed when it landed badly, before any CLI runs."""
    import jax
    import jax.numpy as jnp

    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.training.checkpoint import save_params
    from cermvs_tpu.training.optim import fetch_optimizer
    from cermvs_tpu.training.step import init_state, make_train_step

    def batch(rng):
        B, N = 2, 4
        images = np.zeros((B, N, H, W, 3), np.float32)
        depths = np.zeros((B, N, H, W), np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
        K = np.array([[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]],
                     np.float32)
        for b in range(B):
            Z = rng.uniform(20.0, 40.0)
            coefs = _texture_coefs(rng)
            offs = [0.0] + [rng.uniform(0.5, 2.8) * (1 if v % 2 else -1)
                            for v in range(1, N)]
            for v, x in enumerate(offs):
                images[b, v] = _render(coefs, x, Z)
                poses[b, v, 0, 3] = -x
            depths[b, :] = Z
        return {"images": jnp.asarray(images), "depths": jnp.asarray(depths),
                "poses": jnp.asarray(poses),
                "intrinsics": jnp.asarray(np.tile(K, (B, N, 1, 1)))}

    model = RAFT(cascade=((16, 0.5, 3),), hyp_chunk=4)
    imodel = RAFT(test_mode=True, cascade=((16, 0.5, 3),), hyp_chunk=4)
    xs = [SPACING * (i - N_CAMS // 2) for i in range(N_IMGS)]
    ids = [5] + sorted(range(N_IMGS), key=lambda j: abs(j - 5))[1:11]
    K = np.array([[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]],
                 np.float32)
    ev_images = np.stack([_render(coefs, xs[i], Z_SCAN) for i in ids])
    ev_poses = np.tile(np.eye(4, dtype=np.float32), (len(ids), 1, 1))
    for k, i in enumerate(ids):
        ev_poses[k, 0, 3] = -xs[i]
    ev_intr = np.tile(K, (len(ids), 1, 1))

    for attempt in range(4):
        tx, _ = fetch_optimizer(num_steps=120, lr=2e-3)
        state = init_state(model, tx,
                           jax.random.PRNGKey(attempt), batch(rng))
        step = make_train_step(model, tx, donate=False)
        for i in range(100):  # fresh scenes every step
            state, metrics = step(state, batch(rng), 0.0)
        err = float(metrics["mean_depth_error"])
        params = {"params": jax.device_get(state.params)}
        # validate on a REAL scan view before driving the CLI contract
        disp = imodel.apply(params, jnp.asarray(ev_images)[None],
                            jnp.asarray(ev_poses)[None],
                            jnp.asarray(ev_intr)[None], jnp.ones(1))
        d = np.asarray(disp)[0]
        depth = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0)
        med = float(np.median(depth))
        if err < 6.0 and abs(med - Z_SCAN) < 0.12 * Z_SCAN:
            break
        print(f"operator attempt {attempt}: err={err:.2f} "
              f"scan median={med:.1f} — retraining", flush=True)
    else:
        raise AssertionError(f"operator failed to train: err={err} "
                             f"median={med}")
    save_params(ckpt_dir, params)


def _cli(script, tmp_path, *bindings):
    # the container's axon sitecustomize pins the TPU backend and IGNORES
    # JAX_PLATFORMS (DEVNOTES) — a blank pool-IP list skips its
    # registration entirely so the subprocess truly runs on CPU (observed:
    # without this the drill's CLIs silently ran on the tunneled TPU,
    # queueing behind benchmarks and evaluating the CPU-trained tiny
    # operator under TPU bf16 numerics)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    cmd = [sys.executable, script, "-g", "inference_DTU"]
    for b in bindings:
        cmd += ["-p", b]
    r = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True,
                       text=True, timeout=1800)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r


def test_demo_contract(tmp_path, rng):
    from cermvs_tpu.io.pfm import read_pfm
    from cermvs_tpu.io.ply import read_ply

    root = tmp_path / "DTU"
    coefs = _texture_coefs(np.random.RandomState(7))
    _write_scan(root, coefs)
    ckpt = tmp_path / "ckpt"
    _train_operator(ckpt, rng, coefs)

    out = tmp_path / "results"
    common = [
        f'DTUTest.dataset_path = "{root}"',
        'DTUTest.scan = "scan3"',
        "get_test_data_loader.num_workers = 0",
        f"RAFT.cascade = {CASCADE}",
        "RAFT.hyp_chunk = 4",
    ]
    for rescale in (1, 2):
        _cli("inference.py", tmp_path, *common,
             f'inference.ckpt = "{ckpt}"',
             f'inference.output_folder = "{out}"',
             f"inference.rescale = {rescale}")
    # the PFM naming contract (inference.py:59)
    for ref in range(N_IMGS):
        for rescale in (1, 2):
            f = out / "depths" / f"{ref}_scale{rescale}_nf10.pfm"
            assert f.exists(), sorted(os.listdir(out / "depths"))

    _cli("multires.py", tmp_path, f'multires.output_folder = "{out}"')
    merged = [out / "depths" / f"{ref}_nf10_nf10_th0.02.pfm"
              for ref in range(N_IMGS)]
    for f in merged:
        assert f.exists(), sorted(os.listdir(out / "depths"))
        d = read_pfm(f)
        assert np.isfinite(d).all()

    _cli("fusion.py", tmp_path, *common,
         f'fusion.output_folder = "{out}"')
    ply = out / "result.ply"
    assert ply.exists()
    xyz, rgb = read_ply(ply)
    assert xyz.shape[0] > 500, xyz.shape  # non-empty fused cloud
    # Geometric sanity, anchored to the PIPELINE, not the operator: the
    # fused cloud's depth must track the merged depth maps it was fused
    # from (all cameras look down +z from z=0, so point z == depth), and
    # sit in a loose absolute band around the true plane.  The tiny
    # 100-step operator's bias jitters run-to-run with XLA CPU thread
    # scheduling, so a tight |median - Z| gate is flaky by construction —
    # mm accuracy is QUALITY.md's job; the drill's contract is names,
    # formats, and a cloud consistent with its own depths.
    med_cloud = float(np.median(xyz[:, 2]))
    merged = read_pfm(out / "depths" / "5_nf10_nf10_th0.02.pfm")
    med_depth = float(np.median(merged[merged > 0]))
    assert abs(med_cloud - med_depth) < 0.06 * med_depth, (med_cloud,
                                                          med_depth)
    assert abs(med_cloud - Z_SCAN) < 0.2 * Z_SCAN, med_cloud
    assert rgb.dtype == np.uint8
