"""Production-scale synthetic accuracy harness.

No DTU/TNT data and no pretrained weights exist in this environment, so the
reference's acceptance metrics (DTU 0.332 mm overall,
``/root/reference/README.md:217-220``) cannot be reproduced directly.  This
harness is the credible stand-in: analytic scenes (textured plane, sphere,
depth step) rendered at DTU scale with a multi-view-consistent procedural 3D
texture, evaluated with a WEIGHT-FREE probe — winner-take-all (WTA)
plane-sweep depth read directly off the cost volume.  WTA measures exactly
what the rectified construction approximates (the volume), in physical units
(mm), at production resolution, independent of any learned update operator:

  * per-scene WTA depth error vs analytic GT, exact vs rectified path;
  * argmax agreement between the two constructions (fraction of pixels whose
    volume peak moves, and by how many hypotheses);
  * full-pipeline mode: WTA depths at rescale 1 and 2 written through the
    real file contract -> ``multires`` merge -> adaptive ``fusion`` -> point
    cloud accuracy/completeness against the ANALYTIC surface (point-to-plane
    / point-to-sphere distances are closed-form).

Feature maps are stride-4 space-to-depth patches of the rendered images
(48-dim, zero-mean texture): distinctive enough that the volume peak sits at
GT disparity, with no trained encoder in the loop.  Both constructions see
the SAME features, so any end-metric gap is attributable to the construction.

Usage:
  python benchmarks/quality_harness.py [--size H W] [--views N] [--nf K]
        [--scenes plane,sphere,step] [--pipeline] [--production] [--cpu]

``--production`` = 1152x1600 (rescale 1) + 2304x3200 (rescale 2), 10
neighbors — the DTU inference shape.  Default is a small CPU-runnable size.
Results land in QUALITY.md format on stdout (markdown table rows).
"""

import argparse
import functools
import os
import sys
import time

print = functools.partial(print, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------------------
# Analytic scenes (DTU units: mm; cameras on a ~600 mm sphere, bench.py rig)
# ---------------------------------------------------------------------------


def _camera_rays(pose, K, h, w):
    """World-space rays for every pixel of a (h, w) grid under intrinsics K.

    Returns (origin C (3,), dirs (h, w, 3)) where a point at z-depth Z along
    camera axis sits at ``C + Z * dirs`` (dirs are R^T K^-1 p — NOT unit
    norm; their camera-z component is 1, so Z is z-depth, matching the
    disparity convention of the volume builders)."""
    R, t = pose[:3, :3], pose[:3, 3]
    C = -R.T @ t
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    p = np.stack([xs, ys, np.ones_like(xs)], -1)
    k = p @ np.linalg.inv(K).T          # camera-frame rays, z=1
    return C, k @ R                     # (R^T k^T)^T = k R


class Scene:
    """Analytic surface: z-depth raycast + procedural 3D texture.

    ``px_mm``: surface footprint of one pixel (~Z_nominal / fx).  Texture
    wavelengths span 3..64 pixel footprints: the short end gives the
    correlation peak its sharpness (above Nyquist = aliasing, much longer =
    ambiguous broad peaks), the long end disambiguates repeats.  Scaling by
    the run's actual px_mm keeps the probe equally hard at every
    resolution."""

    name = "base"
    _K_WAVES = 24

    def __init__(self, seed=0, px_mm=0.21):
        rng = np.random.RandomState(seed)
        lam = np.exp(rng.uniform(np.log(3.0 * px_mm), np.log(64.0 * px_mm),
                                 self._K_WAVES))
        dirs = rng.randn(self._K_WAVES, 3)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        self.kvec = (2 * np.pi / lam)[:, None] * dirs        # (K, 3)
        self.phase = rng.uniform(0, 2 * np.pi, (3, self._K_WAVES))
        self.amp = rng.uniform(0.5, 1.0, (3, self._K_WAVES))

    def texture(self, X):
        """X (..., 3) world points -> (..., 3) zero-mean texture in ~±60."""
        ph = X @ self.kvec.T                                  # (..., K)
        out = [np.sin(ph + self.phase[c]) @ self.amp[c] for c in range(3)]
        return np.stack(out, -1).astype(np.float32) * (60.0 / self._K_WAVES**0.5 * 3)

    def depth(self, pose, K, h, w):
        raise NotImplementedError

    def surface_distance(self, pts):
        """Unsigned distance (mm) from points (..., 3) to the surface."""
        raise NotImplementedError

    def surface_samples(self, n, rng):
        """~n points on the surface (for completeness)."""
        raise NotImplementedError

    def render(self, pose, K, h, w):
        C, dirs = _camera_rays(pose, K, h, w)
        Z = self.depth(pose, K, h, w)
        X = C + Z[..., None] * dirs
        return self.texture(X), Z


class PlaneScene(Scene):
    """Tilted plane through the origin (cameras look from z ~ -600)."""

    name = "plane"
    n_vec = np.array([0.15, 0.08, -0.98])
    n_vec = n_vec / np.linalg.norm(n_vec)
    c = 0.0

    def depth(self, pose, K, h, w):
        C, dirs = _camera_rays(pose, K, h, w)
        denom = dirs @ self.n_vec
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        return ((self.c - C @ self.n_vec) / denom).astype(np.float32)

    def surface_distance(self, pts):
        return np.abs(pts @ self.n_vec - self.c)

    def surface_samples(self, n, rng):
        # orthonormal basis of the plane, patch covering the viewed area
        u = np.cross(self.n_vec, [0, 0, 1.0])
        u /= np.linalg.norm(u)
        v = np.cross(self.n_vec, u)
        ab = rng.uniform(-150, 150, (n, 2))
        return ab[:, :1] * u + ab[:, 1:] * v


class SphereScene(Scene):
    """Sphere (r=150) at the origin over a background plane at z=+150."""

    name = "sphere"
    r = 150.0
    z_bg = 150.0

    def depth(self, pose, K, h, w):
        C, dirs = _camera_rays(pose, K, h, w)
        b = 2 * (dirs @ C)
        a = (dirs * dirs).sum(-1)
        disc = b * b - 4 * a * ((C @ C) - self.r**2)
        hit = disc > 0
        Zs = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), np.inf)
        # background plane z = z_bg (world): C_z + Z*d_z = z_bg
        dz = dirs[..., 2]
        Zp = (self.z_bg - C[2]) / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
        Z = np.where(hit & (Zs > 0), Zs, Zp)
        return Z.astype(np.float32)

    def surface_distance(self, pts):
        d_s = np.abs(np.linalg.norm(pts, axis=-1) - self.r)
        d_p = np.abs(pts[..., 2] - self.z_bg)
        return np.minimum(d_s, d_p)

    def surface_samples(self, n, rng):
        v = rng.randn(n, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        front = v[v[:, 2] < 0.3]  # the visible hemisphere (cameras at z<0)
        return front * self.r


class StepScene(Scene):
    """Depth discontinuity: plane z=0 for x<0, z=120 for x>=0."""

    name = "step"
    z_lo, z_hi = 0.0, 120.0

    def depth(self, pose, K, h, w):
        C, dirs = _camera_rays(pose, K, h, w)
        dz = np.where(np.abs(dirs[..., 2]) < 1e-9, 1e-9, dirs[..., 2])
        Z0 = (self.z_lo - C[2]) / dz
        Z1 = (self.z_hi - C[2]) / dz
        x0 = C[0] + Z0 * dirs[..., 0]
        x1 = C[0] + Z1 * dirs[..., 0]
        # near plane (z_lo) owns x<0, far plane x>=0; where the near surface
        # occludes (x0<0 picks near), use it first
        Z = np.where(x0 < 0, Z0, np.where(x1 >= 0, Z1, Z0))
        return Z.astype(np.float32)

    def surface_distance(self, pts):
        d0 = np.abs(pts[..., 2] - self.z_lo)
        d1 = np.abs(pts[..., 2] - self.z_hi)
        return np.where(pts[..., 0] < 0, d0, d1)

    def surface_samples(self, n, rng):
        xy = rng.uniform(-150, 150, (n, 2))
        z = np.where(xy[:, 0] < 0, self.z_lo, self.z_hi)
        return np.stack([xy[:, 0], xy[:, 1], z], -1)


SCENES = {s.name: s for s in (PlaneScene, SphereScene, StepScene)}


# ---------------------------------------------------------------------------
# Weight-free features + WTA cascade
# ---------------------------------------------------------------------------


def space_to_depth_features(images, stride=4):
    """(N, H, W, 3) -> (1, N, H/s, W/s, 3*s*s): each feature cell is the raw
    pixel patch, the weight-free stand-in for the encoder (both constructions
    see the same features, so construction differences are isolated)."""
    N, H, W, C = images.shape
    s = stride
    f = images.reshape(N, H // s, s, W // s, s, C)
    f = f.transpose(0, 1, 3, 2, 4, 5).reshape(N, H // s, W // s, s * s * C)
    return f[None]


def wta_depth(volume_fn, fmaps, poses, K4, n_views, hyp_chunk=8,
              stage0=(64, 64), stage1=(64, 320)):
    """Two-stage WTA plane-sweep depth from the given volume builder.

    volume_fn: build_corr_volume-compatible callable. Returns (h, w) depth
    plus the final-stage volume argmax indices (for agreement stats).
    Hypothesis convention matches the cascade: slab
    ``(arange(D) - D//2)*incre + origin`` (ops/corr.py:21), stage 0 origin
    clamped to ``D//2*incre`` (zero-init shift rule), stage 1 centered on
    the stage-0 peak at 5x finer spacing, then parabolic refinement.
    """
    import jax
    import jax.numpy as jnp

    B = 1
    h, w = fmaps.shape[2:4]
    ii = jnp.zeros(n_views, jnp.int32)
    jj = jnp.arange(1, n_views + 1, dtype=jnp.int32)

    # fmaps/poses/K4 enter as ARGUMENTS: closed-over concrete arrays embed
    # in the HLO as constants, which blows the tunneled backend's compile
    # payload limit (HTTP 413) at production sizes
    @jax.jit
    def run(fmaps, poses, K4):
        def sweep(origin, n_hyp, incre, zero_slab):
            vol = volume_fn(fmaps, poses, K4, ii, jj, origin, n_hyp, incre,
                            hyp_chunk=hyp_chunk, mean_over_views=True,
                            zero_slab=zero_slab)
            return vol[:, 0]  # (B, h, w, D)

        D0, div0 = stage0
        incre0 = 0.0025 / div0
        origin0 = jnp.full((B, 1, h, w), D0 // 2 * incre0, jnp.float32)
        vol0 = sweep(origin0, D0, incre0, True)
        a0 = jnp.argmax(vol0, -1)
        lam0 = origin0[:, 0] + (a0 - D0 // 2) * incre0

        D1, div1 = stage1
        incre1 = 0.0025 / div1
        origin1 = jnp.maximum(lam0[:, None], D1 // 2 * incre1)
        vol1 = sweep(origin1, D1, incre1, False)
        a1 = jnp.argmax(vol1, -1)
        # parabolic sub-hypothesis refinement on the peak
        am = jnp.clip(a1, 1, D1 - 2)
        cm = jnp.take_along_axis(vol1, (am - 1)[..., None], -1)[..., 0]
        c0 = jnp.take_along_axis(vol1, am[..., None], -1)[..., 0]
        cp = jnp.take_along_axis(vol1, (am + 1)[..., None], -1)[..., 0]
        denom = cm - 2 * c0 + cp
        frac = jnp.where(jnp.abs(denom) > 1e-12,
                         0.5 * (cm - cp) / jnp.where(denom == 0, 1, denom), 0.0)
        frac = jnp.clip(frac, -0.5, 0.5)
        lam1 = (origin1[:, 0] + (a1 - D1 // 2 + frac) * incre1)
        return 1.0 / jnp.maximum(lam1[0], 1e-6), a0[0], a1[0]

    depth, a0, a1 = run(fmaps, poses, K4)
    return np.asarray(depth), np.asarray(a0), np.asarray(a1)


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def build_scan(scene, poses, K, H, W):
    """Render all views + GT z-depths."""
    N = poses.shape[0]
    images = np.zeros((N, H, W, 3), np.float32)
    gts = np.zeros((N, H, W), np.float32)
    for v in range(N):
        images[v], gts[v] = scene.render(poses[v].astype(np.float64), K, H, W)
    return images, gts


def depth_error_stats(depth, gt, border=8):
    """Error stats (mm) on the interior (WTA is undefined at slab edges /
    occlusion borders; DTU's protocol also masks)."""
    d = depth[border:-border, border:-border]
    g = gt[border:-border, border:-border]
    err = np.abs(d - g)
    return {
        "median_mm": float(np.median(err)),
        "mean_mm": float(err.mean()),
        "p90_mm": float(np.percentile(err, 90)),
        "frac_lt_2mm": float((err < 2.0).mean()),
    }


def eval_scene(scene_name, H, W, n_views, nf, seed=0, hyp_chunk=8,
               construction_filter=None):
    """WTA depth error for the reference view: exact vs rectified."""
    import jax.numpy as jnp

    from bench import dtu_ring_poses
    from cermvs_tpu.ops.corr import build_corr_volume
    from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
    from cermvs_tpu.ops.rectify import plan_rectification

    fx = 2892.0 * W / 1600
    scene = SCENES[scene_name](seed, px_mm=600.0 / fx)
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float64)
    poses = dtu_ring_poses(nf + 1, np.random.RandomState(1))
    images, gts = build_scan(scene, poses, K, H, W)

    fmaps = jnp.asarray(space_to_depth_features(images))
    h, w = H // 4, W // 4
    K4 = K.copy()
    K4[:2] /= 4
    # GT z-depth at the feature grid = raycast with K4 directly
    gt4 = scene.depth(poses[0].astype(np.float64), K4, h, w)

    K4j = jnp.asarray(np.tile(K4.astype(np.float32), (1, nf + 1, 1, 1)))
    posesj = jnp.asarray(poses[None])

    results = {}
    runs = {"exact": build_corr_volume}
    plan = plan_rectification(poses.astype(np.float64), np.tile(K4, (nf + 1, 1, 1)),
                              h, w)
    if plan.ok:
        runs["rectified"] = make_rectified_volume_fn(plan)
    else:
        results["rectified"] = {"plan_rejected": plan.reason}
    argmaxes = {}
    for name, fn in runs.items():
        if construction_filter and name != construction_filter:
            continue
        t0 = time.perf_counter()
        depth, a0, a1 = wta_depth(fn, fmaps, posesj, K4j, nf,
                                  hyp_chunk=hyp_chunk)
        dt = time.perf_counter() - t0
        stats = depth_error_stats(depth, gt4)
        stats["seconds"] = round(dt, 2)
        results[name] = stats
        results.setdefault("_depths", {})[name] = depth
        argmaxes[name] = (a0, a1)

    depths = results.pop("_depths", {})
    if "exact" in depths and "rectified" in depths:
        # construction delta, decoupled from the WTA probe's own noise
        # floor: the two paths' depths compared against EACH OTHER
        b = 8
        dd = np.abs(depths["exact"][b:-b, b:-b]
                    - depths["rectified"][b:-b, b:-b])
        results["delta"] = {
            "median_mm": float(np.median(dd)),
            "p90_mm": float(np.percentile(dd, 90)),
            # one stage-1 hypothesis quantum ~ Z^2 * incre1
            "frac_within_quantum": float(
                (dd < (600.0 ** 2) * (0.0025 / 320)).mean()),
        }

    if "exact" in argmaxes and "rectified" in argmaxes:
        b = 8
        for st, idx in (("s0", 0), ("s1", 1)):
            ae = argmaxes["exact"][idx][b:-b, b:-b].astype(np.int64)
            ar = argmaxes["rectified"][idx][b:-b, b:-b].astype(np.int64)
            results["agreement"] = results.get("agreement", {})
            results["agreement"][f"{st}_same"] = float((ae == ar).mean())
            results["agreement"][f"{st}_within1"] = float(
                (np.abs(ae - ar) <= 1).mean())
    return results


# ---------------------------------------------------------------------------
# Full-pipeline mode: WTA depths -> multires -> fusion -> cloud vs surface
# ---------------------------------------------------------------------------


def eval_pipeline(scene_name, H, W, n_views, nf, out_dir, seed=0,
                  construction="rectified", hyp_chunk=8):
    """Write WTA depth maps through the real file contract and fuse."""
    import jax.numpy as jnp

    from bench import dtu_ring_poses
    from cermvs_tpu.io.pfm import write_pfm
    from cermvs_tpu.ops.corr import build_corr_volume
    from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
    from cermvs_tpu.ops.rectify import plan_rectification
    from cermvs_tpu.pipeline.fusion import fusion
    from cermvs_tpu.pipeline.multires import multires
    from pathlib import Path

    fx1 = 2892.0 * W / 1600
    scene = SCENES[scene_name](seed, px_mm=600.0 / (2 * fx1))  # finest pass
    out = Path(out_dir)
    (out / "depths").mkdir(parents=True, exist_ok=True)
    poses = dtu_ring_poses(n_views, np.random.RandomState(1))

    scans = {}
    for rescale, (Hr, Wr) in ((1, (H, W)), (2, (2 * H, 2 * W))):
        K = np.array([[2892.0 * Wr / 1600, 0, Wr / 2],
                      [0, 2892.0 * Wr / 1600, Hr / 2], [0, 0, 1]], np.float64)
        images, _ = build_scan(scene, poses, K, Hr, Wr)
        scans[rescale] = (K, images)
        h, w = Hr // 4, Wr // 4
        K4 = K.copy()
        K4[:2] /= 4
        for ref in range(n_views):
            order = [ref] + [j for j in range(n_views) if j != ref][:nf]
            po = poses[order]
            fmaps = jnp.asarray(space_to_depth_features(images[order]))
            K4j = jnp.asarray(np.tile(K4.astype(np.float32),
                                      (1, len(order), 1, 1)))
            fn = build_corr_volume
            if construction == "rectified":
                plan = plan_rectification(po.astype(np.float64),
                                          np.tile(K4, (len(order), 1, 1)), h, w)
                if plan.ok:
                    fn = make_rectified_volume_fn(plan)
            depth, _, _ = wta_depth(fn, fmaps, jnp.asarray(po[None]), K4j,
                                    len(order) - 1, hyp_chunk=hyp_chunk)
            write_pfm(out / "depths" / f"{ref}_scale{rescale}_nf{nf}.pfm",
                      depth.astype(np.float32))

    multires(out, suffix1=f"_nf{nf}", suffix2=f"_nf{nf}")

    class _Loader:
        # fusion consumes full-res (rescale-1-sized) images; the merged depth
        # (scale-2 stride-4 grid = H/2) is resized x2 to match (fusion:215-219)
        num_frames = nf

        def __len__(self):
            return n_views

        def __iter__(self):
            K, images = scans[1]
            for ref in range(n_views):
                order = [ref] + [j for j in range(n_views) if j != ref][:nf]
                # texture is zero-mean (feature probe); shift to [0,255] for
                # the fused cloud's colors
                yield (np.clip(images[order] + 128.0, 0, 255),
                       poses[order],
                       np.tile(K.astype(np.float32), (len(order), 1, 1)),
                       [str(j) for j in order], 1.0)

    ply = fusion(_Loader(), out, rescale=2, suffix=f"_nf{nf}_nf{nf}_th0.02",
                 tot_iter=4)

    verts = _read_ply_xyz(ply)
    rng = np.random.RandomState(2)
    acc = float(np.median(scene.surface_distance(verts))) if len(verts) else float("nan")
    surf = scene.surface_samples(20000, rng)
    comp = float("nan")
    if len(verts):
        # completeness: distance from surface samples to the cloud (subsample
        # the cloud for the O(n*m) distance)
        sub = verts[rng.choice(len(verts), min(len(verts), 20000),
                               replace=False)]
        d2 = ((surf[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
        comp = float(np.median(np.sqrt(d2.min(1))))
    return {"n_points": int(len(verts)), "accuracy_mm": acc,
            "completeness_mm": comp, "ply": str(ply)}


def _read_ply_xyz(path):
    """Minimal PLY reader (xyz of the fused cloud): parses the property
    list for the true vertex byte stride (the writer emits float32 x/y/z +
    uchar r/g/b = 15 bytes/vertex — io/ply.py)."""
    sizes = {"float": 4, "float32": 4, "double": 8, "uchar": 1, "uint8": 1,
             "int": 4, "int32": 4, "short": 2, "ushort": 2}
    with open(path, "rb") as f:
        n = 0
        stride = 0
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property") and n:
                stride += sizes.get(line.split()[1], 4)
            elif line == "end_header":
                break
        raw = f.read(n * stride)
    if n == 0:
        return np.zeros((0, 3), np.float64)
    rec = np.frombuffer(raw, np.uint8).reshape(n, stride)
    return rec[:, :12].copy().view(np.float32).astype(np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[384, 512])
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--nf", type=int, default=5)
    ap.add_argument("--scenes", default="plane,sphere,step")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--production", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/quality")
    args = ap.parse_args()

    if args.cpu:
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from cermvs_tpu.utils.relay import require_tpu_relay

        require_tpu_relay()
        import jax

    # the probe correlates RAW-PIXEL features (huge dynamic range, unlike
    # the trained encoder's normalized features): TPU's DEFAULT matmul
    # precision (fp32 operands as bf16 passes) flips WTA argmaxes and
    # measured +2x median error on BOTH paths — force full precision so the
    # numbers isolate the CONSTRUCTION difference, not matmul rounding.
    # Safe here: every array on this path is fp32 (Mosaic only rejects
    # HIGHEST for bf16 operands, DEVNOTES.md).
    jax.config.update("jax_default_matmul_precision", "highest")

    if args.production:
        args.size = [1152, 1600]
        args.views, args.nf = 11, 10

    H, W = args.size
    print(f"| scene | path | median mm | mean mm | p90 mm | <2mm | s |")
    print(f"|---|---|---|---|---|---|---|")
    agreements = {}
    for name in args.scenes.split(","):
        res = eval_scene(name, H, W, args.views - 1, args.nf)
        for path in ("exact", "rectified"):
            r = res.get(path, {})
            if "median_mm" in r:
                print(f"| {name} {H}x{W} | {path} | {r['median_mm']:.3f} | "
                      f"{r['mean_mm']:.3f} | {r['p90_mm']:.3f} | "
                      f"{r['frac_lt_2mm']:.3f} | {r['seconds']} |")
            else:
                print(f"| {name} {H}x{W} | {path} | {r} | | | | |")
        if "agreement" in res:
            agreements[name] = res["agreement"]
        if "delta" in res:
            d = res["delta"]
            print(f"exact-vs-rectified {name}: median {d['median_mm']:.3f}mm "
                  f"p90 {d['p90_mm']:.3f}mm "
                  f"within-1-quantum {d['frac_within_quantum']:.3f}")
    for name, a in agreements.items():
        print(f"agreement {name}: {a}")

    if args.pipeline:
        for name in args.scenes.split(","):
            for path in ("exact", "rectified"):
                r = eval_pipeline(name, H, W, args.views, args.nf,
                                  f"{args.out}/{name}_{path}",
                                  construction=path)
                print(f"pipeline {name} {path}: acc={r['accuracy_mm']:.3f}mm "
                      f"comp={r['completeness_mm']:.3f}mm "
                      f"n={r['n_points']}")


if __name__ == "__main__":
    main()
