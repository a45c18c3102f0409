"""Pallas TPU kernel v2: prefix-sum multi-level lookup.

Same contract as ``lookup.py`` (all 33 taps of the 3-level pyramid from the
level-0 slab, pooling folded in) but restructured around two observations:

1. pooled window sums are DIFFERENCES OF PREFIX SUMS along the hypothesis
   axis: ``pool_l[i] = (P[(i+1)*2^l - 1] - P[i*2^l - 1]) / 2^l``;
2. all 3 levels' window boundaries are <= 39 positions per pixel, and Mosaic
   DOES lower ``take_along_axis`` natively when the index array's lane width
   equals the source's (128) — so ONE small lane gather fetches every
   boundary.

Per tile this costs a 7-step Hillis-Steele prefix scan + one (TM, 128) lane
gather + static column arithmetic — several times less VPU work than the
banded one-hot reductions (v1 kernel / XLA path).

Numerics: prefix-sum differences lose a few low bits to cancellation
(~1e-4 relative at D=64); the reference pools pairwise so this is NOT
bit-identical — use v1/banded when exactness matters, v2 for speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512
LANES = 128


def _v2_kernel(corr_ref, x0_ref, out_ref, *, D, radius, num_levels):
    n_m = 2 * radius + 3  # boundary offsets m = -r .. r+2 per level
    assert num_levels * n_m <= LANES
    c = corr_ref[:]            # (TM, LANES) zero-padded beyond D
    x0 = x0_ref[:]             # (TM, 1)

    # inclusive prefix sum along lanes (Hillis-Steele with masked rolls)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    P = c
    s = 1
    while s < LANES:
        P = P + jnp.where(lane >= s, pltpu.roll(P, s, axis=1), 0.0)
        s *= 2

    # per-level floor indices c0_l = floor(x0 / 2^l), (TM, 1) each
    c0 = [jnp.floor(x0 / (1 << l)).astype(jnp.int32) for l in range(num_levels)]
    f = [(x0 / (1 << l) - jnp.floor(x0 / (1 << l))) for l in range(num_levels)]

    # slot layout along lanes: slot s = lvl*n_m + t holds boundary position
    # q = (c0_lvl + t - radius) * 2^lvl - 1  (built from iota — pallas
    # kernels may not capture array constants)
    q = jnp.zeros(lane.shape, jnp.int32) + jnp.zeros_like(c0[0])  # (TM,LANES)
    for lvl in range(num_levels):
        in_lvl = (lane >= lvl * n_m) & (lane < (lvl + 1) * n_m)
        t = lane - lvl * n_m
        q_l = (c0[lvl] + t - radius) * (1 << lvl) - 1
        q = jnp.where(in_lvl, q_l, q)

    valid_q = (q >= 0).astype(c.dtype)
    G = jnp.take_along_axis(P, jnp.clip(q, 0, LANES - 1), axis=1) * valid_q

    # LANE-VECTORIZED tap assembly (per-column slicing would pay a full
    # vector op per (TM, 1) column — 128x wasted lanes):
    #   pools[slot(l, m)] = (G[slot+1] - G[slot]) * 2^-l * in_range
    #   taps [slot(l, k)] = (1 - f_l) * pools[slot] + f_l * pools[slot+1]
    # then one static-permutation gather compacts the 11 valid tap slots of
    # each level into the first K_total lanes.
    inv_sel = jnp.zeros(lane.shape, c.dtype)
    f_sel = jnp.zeros_like(c[:, :1]) + jnp.zeros(lane.shape, c.dtype)
    ok_sel = jnp.zeros_like(f_sel)
    for lvl in range(num_levels):
        in_lvl = (lane >= lvl * n_m) & (lane < (lvl + 1) * n_m)
        t = lane - lvl * n_m
        i = c0[lvl] + t - radius  # pool index of this slot
        D_l = D >> lvl
        ok = ((i >= 0) & (i < D_l)).astype(c.dtype)
        inv_sel = jnp.where(in_lvl, 1.0 / (1 << lvl), inv_sel)
        f_sel = jnp.where(in_lvl, f[lvl].astype(c.dtype), f_sel)
        ok_sel = jnp.where(in_lvl, ok, ok_sel)

    G_next = pltpu.roll(G, LANES - 1, axis=1)
    pools = (G_next - G) * inv_sel * ok_sel
    taps = (1.0 - f_sel) * pools + f_sel * pltpu.roll(pools, LANES - 1, axis=1)

    # compact: output column j (level j//K, tap j%K) <- slot (j//K)*n_m + j%K
    K = 2 * radius + 1
    j_lane = lane  # (1, LANES)
    slot_of = (j_lane // K) * n_m + (j_lane % K)
    slot_of = jnp.where(j_lane < num_levels * K, slot_of, 0)
    compact = jnp.take_along_axis(
        taps, jnp.broadcast_to(slot_of, taps.shape), axis=1)
    out_ref[:] = compact[:, : num_levels * K]


def lookup_fused_v2(corr0: jnp.ndarray, x0: jnp.ndarray, radius: int = 5,
                    num_levels: int = 3) -> jnp.ndarray:
    """corr0 (..., D<=128); x0 (...) -> (..., num_levels*(2*radius+1))."""
    D = corr0.shape[-1]
    assert D <= LANES
    K_total = num_levels * (2 * radius + 1)
    lead = corr0.shape[:-1]

    c2 = corr0.reshape(-1, D).astype(jnp.float32)
    M = c2.shape[0]
    pad_m = (-M) % TILE_M
    if pad_m:
        c2 = jnp.pad(c2, ((0, pad_m), (0, 0)))
    if D != LANES:
        c2 = jnp.pad(c2, ((0, 0), (0, LANES - D)))
    x2 = x0.reshape(-1, 1).astype(jnp.float32)
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = c2.shape[0]

    out = pl.pallas_call(
        functools.partial(_v2_kernel, D=D, radius=radius,
                          num_levels=num_levels),
        grid=(Mp // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, K_total), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, K_total), jnp.float32),
    )(c2, x2)
    return out[:M].reshape(lead + (K_total,))
