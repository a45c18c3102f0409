"""Banded hat-matrix warp probe (ROADMAP 3 / round-3 VERDICT #3b).

The two-pass warp's horizontal pass builds a FULL-WIDTH hat tensor
``S[r, s, x] = hat(s - m[r, x])`` and contracts over all ``w_s`` input
columns, though each output column's hat support spans only ±1 around
``m``.  This probe measures a BANDED variant: output columns in chunks of
128; per (row-block, chunk) a ``jax.lax.dynamic_slice`` at the traced
``floor(min m) - 2`` start pulls a static-width band (chunk span ×
max-scale + slack), and the hat weights are evaluated against GLOBAL
column indices so any support the band fails to cover contributes zero
(the out-of-band semantics the warp already has) rather than garbage.

Shapes mirror the headline rectified construction's warps
(1152×1600 nf10: rect grids 512×512, src bands ~1104; C=64 bf16).

Run on the TPU from repo root: python benchmarks/profile_banded_warp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit_scalar(fn, *args, iters=5):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters


def full_pass(img, m, out_w):
    """The current row pass: full-width hat einsum (bf16, fp32 accum)."""
    h_s, w_s, C = img.shape
    s = jax.lax.broadcasted_iota(jnp.float32, (h_s, w_s, out_w), 1)
    S = jnp.maximum(1.0 - jnp.abs(s - m[:, None, :]), 0.0)
    return jnp.einsum("rsc,rsx->rxc", img, S.astype(img.dtype),
                      preferred_element_type=jnp.float32)


def banded_pass(img, m, out_w, chunk=128, band=256):
    """Banded variant: per output chunk, slice a ``band``-wide input window
    at the traced band start; hats evaluated against global indices."""
    h_s, w_s, C = img.shape
    n_chunks = -(-out_w // chunk)
    if n_chunks * chunk != out_w:  # pad the position map (edge values keep
        # the last chunk's band anchored to its REAL columns); slice output
        m = jnp.pad(m, ((0, 0), (0, n_chunks * chunk - out_w)), mode="edge")

    def one_chunk(c):
        mc = jax.lax.dynamic_slice_in_dim(m, c * chunk, chunk, axis=1)
        start = jnp.clip(
            jnp.floor(mc.min()).astype(jnp.int32) - 2, 0,
            max(w_s - band, 0))
        win = jax.lax.dynamic_slice(img, (0, start, 0), (h_s, band, C))
        s = (jax.lax.broadcasted_iota(jnp.float32, (h_s, band, chunk), 1)
             + start.astype(jnp.float32))
        S = jnp.maximum(1.0 - jnp.abs(s - mc[:, None, :]), 0.0)
        return jnp.einsum("rsc,rsx->rxc", win, S.astype(img.dtype),
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    out = jnp.moveaxis(out, 0, 1).reshape(h_s, n_chunks * chunk, C)
    return out[:, :out_w]


def main():
    rng = np.random.RandomState(0)
    C = 64
    for h_s, w_s, out_w, tag in ((288, 400, 512, "ref warp s1-ish"),
                                 (512, 512, 512, "rect-ref 512x512"),
                                 (512, 512, 1104, "rect-src band"),
                                 (512, 1104, 512, "back-warp")):
        img = jnp.asarray(rng.randn(h_s, w_s, C).astype(np.float32)).astype(
            jnp.bfloat16)
        # smooth near-identity warp curve (rotation-rectification class):
        # scale in [0.85, 1.15] + mild row shear, like gated plans
        y = np.arange(h_s)[:, None]
        x = np.arange(out_w)[None, :]
        m_np = (x * (0.9 + 0.0002 * y) + 0.02 * y
                + 3.0 * np.sin(x / max(out_w, 1) * 2)).astype(np.float32)
        m_np = np.clip(m_np, 0, w_s - 1)
        m = jnp.asarray(m_np)
        REP = 20  # amortize the ~28 ms tunnel dispatch in-graph

        def loop(fn):
            def run(im, mm):
                def body(acc, _):
                    # perturb the input so XLA cannot CSE the iterations
                    return acc, fn(im + acc * 1e-6, mm).sum()
                _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=REP)
                return s.sum()
            return jax.jit(run)

        a = np.asarray(jax.jit(lambda im, mm: full_pass(im, mm, out_w))(img, m))
        b = np.asarray(jax.jit(lambda im, mm: banded_pass(im, mm, out_w))(img, m))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        tf = timeit_scalar(loop(lambda im, mm: full_pass(im, mm, out_w)),
                           img, m) / REP
        tb = timeit_scalar(loop(lambda im, mm: banded_pass(im, mm, out_w)),
                           img, m) / REP
        print(f"{tag:20s} ({h_s}x{w_s}->{out_w}): full {tf*1e3:7.2f} ms  "
              f"banded {tb*1e3:7.2f} ms  (x{tf/tb:.2f}; max rel diff "
              f"{rel:.2e})", flush=True)


if __name__ == "__main__":
    main()
