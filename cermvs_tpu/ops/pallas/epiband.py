"""Fused rectified cost-volume kernel: row-correlation matmul + banded select.

TPU-native replacement for the hot half of ``alt_cuda_corr``
(``correlation_kernel.cu:19-119``): after rectification
(``ops/rectify.py``) every hypothesis sample of rect-ref pixel ``(y, x)``
lies ON ROW ``y`` of the rect-src image at column

    pos(x, k) = x + s_max - base(x, y) - k * sigma(x, y)

so per (view, row, x-chunk) the kernel computes

    G = F_ref_chunk @ F_src_row^T          (MXU, bf16 -> fp32)
    out[x, k] = linear-interp of G[x, .] at pos(x, k)   (VPU)

with ``G`` never leaving VMEM.  The interpolation is gather-free:

1. a per-row BARREL ALIGNMENT left-rotates each row of ``G`` by
   ``c(x) = floor(p0(x)) - (M - 2)`` (log2(ws) conditional ``pltpu.roll``
   stages), putting every row's active window at lanes ``[0, M)``;
2. per hypothesis ``k`` a STATIC lane slice bounded by the scene-wide
   disparity-rate interval (``RectPlan.rate_lo/rate_hi``) plus a hat-function
   (compare/select/multiply) reduce computes the 2-tap lerp.  Positions
   outside the physical band get zero via validity masks, matching
   ``sampling.interp1d`` (and the reference's zero out-of-bounds corners).

Wide static windows (far TNT views, sigma ~17 px/hypothesis) blow the
``sm``/``ones`` expansion matrices (~``D^2 * Delta-sigma / 2`` lanes) past
the ~14 MB Mosaic scoped-VMEM budget; the HYPOTHESIS-CHUNKED kernel
(``k_chunks > 1``, :func:`pick_k_chunks`) splits the hypothesis axis on a
4th grid dimension — ``G`` computed once per x-cell into VMEM scratch,
per-chunk realignment shrinking the windows to ``(D/n_k)^2`` — so every
production window compiles (round-5; BENCH_NOTES study table).

Differentiable: ``epiband_resample`` carries a custom VJP (Pallas backward
kernels) w.r.t. the FEATURES only — ``base``/``sigma`` (the sample
coordinates) get zero gradient, matching the reference CUDA backward which
allocates but never writes ``coords_grad``
(``correlation_kernel.cu:307,323``).  The backward reuses the forward's
structure in reverse: expand d_out to hat-window space (one MXU matmul
against the transposed segment matrix), weight, inverse barrel-rotate, then
``dfr = dG @ fs`` and ``dfs = dG^T @ fr`` with dfs accumulated across
x-chunks by revisiting its (view, row) output block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XC = 128  # x-chunk (sublane) tile; plans round w_r to a multiple of this


def _hat_window_sum(av, sigma, rel0, ones_ref, kv_ref, sm_ref, xc, M):
    """Hat-weighted window sums on FULL-WIDTH lane arrays.

    Replaces the per-hypothesis slice loop (D ops on (xc, ~width) arrays at
    <1/8 lane utilization, plus a D-way concat): expand the aligned window
    to concatenated-window lanes with one static 0/1 matmul
    (av_exp[:, j] = av[:, m(j)] — sm transposed), evaluate every hat weight
    in one (xc, total) vector expression via the static k(j)/m(j) lane maps,
    then segment-sum per hypothesis (the existing ones matmul).
    """
    Mp = sm_ref.shape[1]
    if Mp != M:
        av = jnp.concatenate(
            [av, jnp.zeros((xc, Mp - M), jnp.float32)], axis=1)
    hi = ones_ref.dtype == jnp.float32
    av_exp = jax.lax.dot_general(
        av.astype(sm_ref.dtype), sm_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if hi
                   else jax.lax.Precision.DEFAULT))    # (xc, total)
    km = kv_ref[0:1, :]
    mm = kv_ref[1:2, :]
    rel = rel0 - km * sigma                            # (xc, total)
    wgt = jnp.maximum(1.0 - jnp.abs(mm - rel), 0.0)
    return _segment_sum(av_exp * wgt, ones_ref)


def _epiband_kernel(fr_ref, fs_ref, base_ref, sigma_ref, ones_ref, kv_ref,
                    sm_ref, out_ref, *,
                    D, s_max, ws, M, xc=XC, n_rows=1, n_chunks=1):
    """One (view, row, x-chunk) cell.

    fr_ref: (1,1,XC,C); fs_ref: (1,1,ws,C); base/sigma: (1,1,XC,1);
    ones_ref: (sum(widths), D) static segment-sum matrix; out_ref:
    (1,1,XC,D).
    """
    xchunk = pl.program_id(2)
    fr = fr_ref[0, 0]            # (XC, C)
    fs = fs_ref[0, 0]            # (ws, C)
    # bf16 inputs accumulate exactly in fp32 on the MXU; fp32 inputs need
    # HIGHEST or the default TPU matmul truncates them to bf16 (and Mosaic
    # rejects HIGHEST with a bf16 lhs)
    G = jax.lax.dot_general(
        fr, fs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if fr.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT))  # (XC, ws)

    # base/sigma are flattened (cells, xc) rows blocked (8, xc) — Mosaic
    # requires >=8-sublane blocks; pick this cell's row then relayout the
    # (xc,) lane row to a sublane column (1 vreg)
    r = ((pl.program_id(0) * n_rows + pl.program_id(1)) * n_chunks
         + pl.program_id(2))
    base = base_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    sigma = sigma_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    xg = (jax.lax.broadcasted_iota(jnp.int32, (xc, 1), 0).astype(jnp.float32)
          + (xchunk * xc).astype(jnp.float32))
    p0 = xg + float(s_max) - base          # position of hypothesis k=0
    c = jnp.floor(p0).astype(jnp.int32) - (M - 2)
    c = jnp.clip(c, -M, ws - 1)            # lower clamp only for pixels whose
    rel0 = p0 - c.astype(jnp.float32)      # entire slab is out of band

    # barrel alignment: aligned[x, m] = G[x, (c(x) + m) mod ws], two-level.
    # Split the left-rotate amount c = 128q + r: the q bits roll the FULL
    # width (~log2(ws/128) stages), then a static slice to Wn = M + 128
    # lanes carries the residual r < 128 (7 stages on the narrow array);
    # the residual never wraps (r + m < Wn for m < M), so this equals the
    # single full-width ladder.  (Measured: the whole ladder is ~1 ms of a
    # 22 ms view — the kernel is bound by the hat/segment-sum stage, not
    # alignment; see benchmarks/profile_epiband4.py.)
    cpos = jnp.where(c < 0, c + ws, c)     # left-rotate amount in [0, ws)
    for b in range(max(1, math.ceil(math.log2(-(-ws // 128))))):
        amt = 128 << b
        if amt >= ws:
            break
        bit = (cpos & amt) > 0             # (XC, 1) bool
        G = jnp.where(bit, pltpu.roll(G, ws - amt, axis=1), G)
    Wn = min(M + 128, ws)
    Gn = G[:, :Wn]
    for b in range(7):
        amt = 1 << b
        if amt >= ws:
            break
        bit = (cpos & amt) > 0
        Gn = jnp.where(bit, pltpu.roll(Gn, Wn - amt, axis=1), Gn)
    aligned = Gn[:, :M]                    # (XC, M)

    # validity of window column m: 0 <= c + m <= ws - 1 (excludes wrap-around
    # and the out-of-band zero-padding semantics of interp1d)
    miota = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    s_abs = c + miota                      # (XC, M)
    valid = ((s_abs >= 0) & (s_abs <= ws - 1)).astype(jnp.float32)
    av = aligned * valid

    out_ref[0, 0, :, :] = _hat_window_sum(
        av, sigma, rel0, ones_ref, kv_ref, sm_ref, xc, M)


def _segment_sum(prod, ones_ref):
    """Per-window reduction as ONE matmul against a static block-ones segment
    matrix — Mosaic lane reductions per k measured ~7x slower.

    Precision follows the ones buffer's dtype (epiband_resample keys it on
    the feature dtype): fp32 ones => HIGHEST (the default TPU matmul
    truncates fp32 operands to bf16 passes — verified on-chip — which breaks
    interp1d parity for fp32 inputs); bf16 ones => round the products and
    take the single-pass matmul (fp32 accumulate).  The fp32-HIGHEST segment
    sum is otherwise THE dominant kernel cost (6 MXU passes; 22.4 -> 13.7 ms
    per view at DEFAULT, benchmarks/profile_epiband4.py) — with bf16
    features the products already carry bf16-level noise, so the bf16 path
    costs no additional accuracy class.
    """
    if ones_ref.dtype == jnp.float32:
        return jnp.dot(prod, ones_ref[:, :],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(prod.astype(ones_ref.dtype), ones_ref[:, :],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _epiband_kernel_static(fr_ref, fs_ref, sigma_ref, ones_ref, kv_ref,
                           sm_ref, out_ref, *,
                           D, s_max, ws, M, W_band, xc, n_rows,
                           n_chunks):
    """Zero-base variant (stage 0: the hypothesis slab starts at inverse
    depth 0 everywhere, so ``base == 0`` STATICALLY).

    The k=0 sample position is ``p0 = x + s_max`` — integer and known per
    lane — so instead of a dense ``(xc, ws)`` correlation plus a full-width
    dynamic barrel roll, this computes G only on the per-chunk DIAGONAL BAND
    ``fs[x0 + s_max - M + 2 : ... + W_band]`` (a static-size slice at a
    grid-scalar offset) and aligns with rolls whose amounts are the lane
    iota (max amount < xc + slack): ~4x less MXU work and ~1.5x fewer roll
    stages on a ~2x narrower array than the dynamic kernel at bench shapes.
    ``rel0 = M - 2`` exactly, and every window position is in-band by
    construction (no validity mask).
    """
    x0 = pl.program_id(2) * xc
    # k=0 position p0 = x + s_max; window column 0 sits at c = p0 - (M - 2).
    # The fetched band starts at the 8-ALIGNED s_max - M offset (x0, s_max, M
    # all 8-multiples — Mosaic must statically prove sublane-slice alignment)
    # and the residual +2 rides in the roll amounts.
    K8 = s_max - M
    start = 8 * jnp.minimum((x0 + K8) // 8, (ws - W_band) // 8)
    fr = fr_ref[0, 0]                              # (xc, C)
    fs_band = fs_ref[0, 0, pl.ds(start, W_band), :]  # (W_band, C)
    G = jax.lax.dot_general(
        fr, fs_band, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if fr.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT))  # (xc, W_band)

    # align: aligned[x, m] = G[x, (x0 + K8 + 2 + x_local) - start + m]
    amt = (jax.lax.broadcasted_iota(jnp.int32, (xc, 1), 0)
           + (x0 + K8 + 2 - start))                # (xc, 1) in [0, max_amt]
    max_amt = (xc + 1
               + max(0, (n_chunks - 1) * xc + K8 + W_band - ws))
    nbits = max(1, math.ceil(math.log2(max_amt + 1)))
    for b in range(nbits):
        a = 1 << b
        bit = (amt & a) > 0
        G = jnp.where(bit, pltpu.roll(G, W_band - (a % W_band), axis=1), G)
    aligned = G[:, :M]                             # (xc, M)

    r = ((pl.program_id(0) * n_rows + pl.program_id(1)) * n_chunks
         + pl.program_id(2))
    sigma = sigma_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    rel0 = jnp.full((xc, 1), float(M - 2), jnp.float32)
    out_ref[0, 0, :, :] = _hat_window_sum(
        aligned, sigma, rel0, ones_ref, kv_ref, sm_ref, xc, M)


def _window_and_slices(D, sigma_lo, sigma_hi):
    """Static window size M and per-k lane slices from scene rate bounds."""
    M = int(math.ceil(max((D - 1) * sigma_hi, 0.0))) + 4
    M = -(-M // 8) * 8  # mild alignment
    slices = []
    for k in range(D):
        # rel_k = (M - 2) + frac - k*sigma, sigma in [sigma_lo, sigma_hi]
        lo = M - 2 - k * sigma_hi
        hi = M - 1 - k * sigma_lo
        u0 = max(0, int(math.floor(lo)) - 1)
        u1 = min(M, int(math.ceil(hi)) + 2)
        slices.append((u0, max(u1, u0 + 1)))
    return M, slices


def _epiband_kernel_chunked(fr_ref, fs_ref, base_ref, sigma_ref, ones_ref,
                            kv_ref, sm_ref, out_ref, G_ref, *,
                            D, s_max, ws, M, Dc, xc, n_rows, n_chunks):
    """Hypothesis-CHUNKED variant of :func:`_epiband_kernel`: a 4th grid
    dimension splits the (padded) hypothesis axis into ``n_k = Dp / Dc``
    chunks.  ``G`` is computed ONCE per (view, row, x-chunk) into VMEM
    scratch (grid iterations are sequential on a TPU core, so scratch
    persists across the innermost chunk dimension); each chunk re-aligns to
    its OWN k0 position, shrinking the static window to
    ``M_c ~ Dc * sigma_hi + 4`` — the ``sm``/``ones`` expansion matrices
    scale as ``(D/n_k)^2 * Delta-sigma`` instead of ``D^2 * Delta-sigma``.
    This is what lifts the whole-window VMEM cap: every TNT nf25 view
    (sigma ~17 px/hypothesis, 17-36 MB unchunked) fits the Mosaic budget at
    a suitable ``n_k`` (round-4 VERDICT #2).  Exact: per-chunk realignment
    only re-associates the fp32 position arithmetic (p0 - k0*sigma)."""
    kc = pl.program_id(3)

    @pl.when(kc == 0)
    def _g():
        fr = fr_ref[0, 0]            # (xc, C)
        fs = fs_ref[0, 0]            # (ws, C)
        G_ref[:, :] = jax.lax.dot_general(
            fr, fs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST if fr.dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT))

    r = ((pl.program_id(0) * n_rows + pl.program_id(1)) * n_chunks
         + pl.program_id(2))
    base = base_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    sigma = sigma_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    xg = (jax.lax.broadcasted_iota(jnp.int32, (xc, 1), 0).astype(jnp.float32)
          + (pl.program_id(2) * xc).astype(jnp.float32))
    k0 = (kc * Dc).astype(jnp.float32)
    p0 = xg + float(s_max) - base - k0 * sigma   # chunk's k=k0 position
    c = jnp.floor(p0).astype(jnp.int32) - (M - 2)
    c = jnp.clip(c, -M, ws - 1)
    rel0 = p0 - c.astype(jnp.float32)
    cpos = jnp.where(c < 0, c + ws, c)

    G = G_ref[:, :]
    for b in range(max(1, math.ceil(math.log2(-(-ws // 128))))):
        amt = 128 << b
        if amt >= ws:
            break
        bit = (cpos & amt) > 0
        G = jnp.where(bit, pltpu.roll(G, ws - amt, axis=1), G)
    Wn = min(M + 128, ws)
    Gn = G[:, :Wn]
    for b in range(7):
        amt = 1 << b
        if amt >= ws:
            break
        bit = (cpos & amt) > 0
        Gn = jnp.where(bit, pltpu.roll(Gn, Wn - amt, axis=1), Gn)
    aligned = Gn[:, :M]

    miota = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    s_abs = c + miota
    valid = ((s_abs >= 0) & (s_abs <= ws - 1)).astype(jnp.float32)
    av = aligned * valid

    hs = _hat_window_sum(av, sigma, rel0, ones_ref, kv_ref, sm_ref, xc, M)

    @pl.when(kc == 0)
    def _init():
        out_ref[0, 0, :, :] = hs

    @pl.when(kc != 0)
    def _acc():
        out_ref[0, 0, :, :] = out_ref[0, 0, :, :] + hs


def kernel_vmem_bytes(n_hyp, sigma_lo, sigma_hi, ws, C, fp32=False,
                      xc=XC, s_max=None, k_chunks=1):
    """Predicted VMEM residency of one epiband kernel instance.

    The window-dependent terms dominate and scale with ``total`` — the
    summed per-hypothesis slice widths, which grow ~``D^2 *
    (sigma_hi - sigma_lo) / 2``: wide static rate windows (merged view
    groups, or single far TNT views at sigma ~17 px/hypothesis) blow the
    ``sm``/``ones`` expansion matrices past VMEM and crash the Mosaic
    compile (round-4: 10.8 MB at a 4.6x-span group -> HTTP 500).  Callers
    (``corr_rectified.group_views`` and the inference runner's
    affordability gate) keep instances under ``EPIBAND_VMEM_CAP``.
    """
    if sigma_hi is None or sigma_hi <= 0:
        # mirror the builder (corr_rectified passes sigma_hi=None when
        # rate_hi <= 0, and epiband_resample then spans the full band):
        # estimate at the full-band window, not the degenerate M=4 one
        sigma_lo = 0.0
        sigma_hi = float(s_max if s_max is not None else ws) / max(
            n_hyp - 1, 1)
    Dp = -(-n_hyp // 64) * 64
    d_eff = n_hyp
    if k_chunks > 1:
        # chunked kernel: per-chunk windows/slices are built for Dc
        # hypotheses; one ones/kv/sm set serves every chunk (the slice
        # structure depends only on dk in [0, Dc)).  Scratch G persists in
        # VMEM across the chunk grid dimension.
        d_eff = Dp // k_chunks
    M, slices = _window_and_slices(d_eff, sigma_lo, sigma_hi)
    M = min(M, ws)
    total = sum(min(u1, M) - min(u0, M - 1) for u0, u1 in slices)
    Mp = -(-M // 128) * 128
    b = 4 if fp32 else 2
    return (total * Dp * b          # ones segment matrix (per-chunk block)
            + total * Mp * b        # sm scatter matrix (backward)
            + 8 * total * 4         # kv lane maps
            + xc * total * 4        # av_exp runtime expansion
            + xc * ws * 4           # G correlation row block (or scratch)
            + (xc * ws * 4 if k_chunks > 1 else 0)  # bwd dG scratch
            + ws * C * 2)           # fs feature block


def pick_k_chunks(n_hyp, sigma_lo, sigma_hi, ws, C, cap=None, max_k=8,
                  s_max=None):
    """Smallest hypothesis-chunk count whose kernel fits the VMEM cap.

    Returns 1 for the unchunked fast path, a power of two up to ``max_k``
    for the chunked kernel, or 0 when even maximal chunking does not fit
    (the caller then routes the view to the exact gather path)."""
    cap = cap or EPIBAND_VMEM_CAP
    Dp = -(-n_hyp // 64) * 64
    k = 1
    while k <= max_k and Dp % k == 0 and Dp // k >= 8:
        if kernel_vmem_bytes(n_hyp, sigma_lo, sigma_hi, ws, C,
                             s_max=s_max, k_chunks=k) <= cap:
            return k
        k *= 2
    return 0


# calibrated on the real toolchain (round-4 sweep, single-view kernels at
# increasing windows): estimates up to 14.0 MB compiled, 14.9 MB crashed
# the Mosaic compile (HTTP 500) — cap at the last known-good point
EPIBAND_VMEM_CAP = 14 * 1024 * 1024


def _setup(fr_rect, fs_rect, n_hyp, s_max, sigma_lo, sigma_hi, interpret,
           xc, static_base, k_chunks=1):
    """Static configuration shared by the forward and backward pallas calls."""
    V, h_r, w_r, C = fr_rect.shape
    ws = fs_rect.shape[2]
    xc = xc or XC
    assert w_r % xc == 0, (w_r, xc)
    if jax.default_backend() == "cpu":
        interpret = True  # pallas has no CPU backend; tests run interpreted

    # pad the hypothesis (output lane) axis to a multiple of 64: unaligned
    # lane counts (e.g. the cascade's D=44 stage) cost masked stores
    Dp = -(-n_hyp // 64) * 64
    k_chunks = int(k_chunks) or 1
    assert Dp % k_chunks == 0, (Dp, k_chunks)
    Dc = Dp // k_chunks
    # chunked kernels build windows/slices for Dc hypotheses: the slice
    # structure depends only on dk in [0, Dc), so ONE ones/kv/sm set serves
    # every chunk; out columns beyond n_hyp carry garbage, trimmed by the
    # caller like the unchunked Dp padding
    d_win = n_hyp if k_chunks == 1 else Dc
    M, slices = _window_and_slices(d_win, sigma_lo, sigma_hi)
    M = min(M, ws)
    slices = [(min(u0, M - 1), min(u1, M)) for (u0, u1) in slices]

    # static segment-sum matrix: lane j of the concatenated products belongs
    # to hypothesis seg(j) — ones[j, k] = 1 iff seg(j) == k
    widths = [u1 - u0 for (u0, u1) in slices]
    total = sum(widths)
    seg = np.repeat(np.arange(d_win), widths)
    m_of_j_pre = (np.concatenate(
        [np.arange(u0, u1) for (u0, u1) in slices]) if total else np.zeros(
            0, np.int64))
    if k_chunks > 1:
        # ones is BLOCKED along rows per chunk: Mosaic wants 8-divisible
        # sublane blocks — pad the concatenated-window axis; padded lanes
        # carry seg/m = -1, matching no column (zero rows end to end)
        total_pad = -(-total // 8) * 8
        # sentinel low enough that seg + kc*Dc never hits a valid column
        seg = np.concatenate([seg, np.full(total_pad - total, -(Dp + 1))])
        m_of_j_pre = np.concatenate(
            [m_of_j_pre, np.full(total_pad - total, -1)])
        total = total_pad
    # the segment matrix's dtype selects the in-kernel reduction precision
    # (see _segment_sum): bf16 features => single-pass bf16 matmul
    seg_dtype = (np.float32 if fr_rect.dtype == jnp.float32 else jnp.bfloat16)
    if k_chunks == 1:
        ones = jnp.asarray(
            (seg[:, None] == np.arange(Dp)[None, :]).astype(
                np.float32)).astype(seg_dtype)
    else:
        # per-chunk segment matrices, stacked along rows and block-indexed
        # by the chunk grid dimension: chunk kc's matrix scatters its local
        # hypotheses dk in [0, Dc) to ABSOLUTE columns kc*Dc + dk, so each
        # chunk's (xc, Dp) contribution accumulates into the full out block
        # (Mosaic wants out blocks 128-divisible or full-width — full-width
        # revisited blocks avoid dynamic lane slicing entirely)
        ones_np = np.zeros((k_chunks * total, Dp), np.float32)
        for kc in range(k_chunks):
            ones_np[kc * total: (kc + 1) * total] = (
                (seg[:, None] + kc * Dc) == np.arange(Dp)[None, :])
        ones = jnp.asarray(ones_np).astype(seg_dtype)

    # backward-only static maps: k(j)/m(j) per concatenated-window lane j
    # (kv rows 0/1) and the window-column scatter matrix sm[j, m] = 1 iff
    # m(j) == m (columns padded to a lane multiple)
    m_of_j = m_of_j_pre
    kv = np.zeros((8, total), np.float32)
    kv[0] = seg.astype(np.float32)
    kv[1] = m_of_j.astype(np.float32)
    kv = jnp.asarray(kv)
    Mp = -(-M // 128) * 128
    sm = jnp.asarray(
        (m_of_j[:, None] == np.arange(Mp)[None, :]).astype(np.float32)
    ).astype(seg_dtype)

    n_chunks = w_r // xc
    cells = V * h_r * n_chunks
    cells_pad = -(-cells // 8) * 8
    flat = lambda a: jnp.pad(
        a.reshape(cells, xc), ((0, cells_pad - cells), (0, 0)))

    def _cell_index(v, y, x):
        return (((v * h_r + y) * n_chunks + x) // 8, 0)

    if k_chunks == 1:
        specs = {
            "fr": pl.BlockSpec((1, 1, xc, C), lambda v, y, x: (v, y, x, 0),
                               memory_space=pltpu.VMEM),
            "fs": pl.BlockSpec((1, 1, ws, C), lambda v, y, x: (v, y, 0, 0),
                               memory_space=pltpu.VMEM),
            # sigma (and base): flattened cell rows, 8-sublane blocks (no
            # trailing size-1 dims anywhere — XLA pads small lane dims 128x)
            "row": pl.BlockSpec((8, xc), _cell_index,
                                memory_space=pltpu.VMEM),
            "ones": pl.BlockSpec((total, Dp), lambda v, y, x: (0, 0),
                                 memory_space=pltpu.VMEM),
            "kv": pl.BlockSpec((8, total), lambda v, y, x: (0, 0),
                               memory_space=pltpu.VMEM),
            "sm": pl.BlockSpec((total, Mp), lambda v, y, x: (0, 0),
                               memory_space=pltpu.VMEM),
            "out": pl.BlockSpec((1, 1, xc, Dp), lambda v, y, x: (v, y, x, 0),
                                memory_space=pltpu.VMEM),
        }
    else:
        # 4-D grid (v, y, x, kc): fr/fs/rows ignore kc (blocks stay
        # resident across the innermost chunk loop); out blocks Dc lanes
        # per chunk; ones/kv/sm shared by all chunks
        def _cell_index4(v, y, x, kc):
            return _cell_index(v, y, x)

        specs = {
            "fr": pl.BlockSpec((1, 1, xc, C),
                               lambda v, y, x, kc: (v, y, x, 0),
                               memory_space=pltpu.VMEM),
            "fs": pl.BlockSpec((1, 1, ws, C),
                               lambda v, y, x, kc: (v, y, 0, 0),
                               memory_space=pltpu.VMEM),
            "row": pl.BlockSpec((8, xc), _cell_index4,
                                memory_space=pltpu.VMEM),
            "ones": pl.BlockSpec((total, Dp), lambda v, y, x, kc: (kc, 0),
                                 memory_space=pltpu.VMEM),
            "kv": pl.BlockSpec((8, total), lambda v, y, x, kc: (0, 0),
                               memory_space=pltpu.VMEM),
            "sm": pl.BlockSpec((total, Mp), lambda v, y, x, kc: (0, 0),
                               memory_space=pltpu.VMEM),
            "out": pl.BlockSpec((1, 1, xc, Dp),
                                lambda v, y, x, kc: (v, y, x, 0),
                                memory_space=pltpu.VMEM),
        }
    W_band = None
    if static_base:
        assert ws >= xc + M + 8 and ws % 8 == 0, (ws, xc, M)
        # band must cover [s_max - M .. x + s_max + 2] per chunk (the +2
        # window residual folded out of the 8-aligned start)
        W_band = min(-(-(xc + M + 8) // 128) * 128, ws)
    return dict(V=V, h_r=h_r, w_r=w_r, C=C, ws=ws, xc=xc,
                interpret=interpret, M=M, Mp=Mp, slices=slices, Dp=Dp,
                Dc=Dc, k_chunks=k_chunks,
                widths=widths, total=total, ones=ones, kv=kv, sm=sm,
                n_chunks=n_chunks, flat=flat, specs=specs, W_band=W_band)


def _epiband_fwd_impl(fr_rect, fs_rect, base, sigma, n_hyp, s_max, sigma_lo,
                      sigma_hi, interpret, xc, static_base, k_chunks=1):
    cfg = _setup(fr_rect, fs_rect, n_hyp, s_max, sigma_lo, sigma_hi,
                 interpret, xc, static_base, k_chunks)
    s = cfg["specs"]
    out_shape = jax.ShapeDtypeStruct(
        (cfg["V"], cfg["h_r"], cfg["w_r"], cfg["Dp"]), jnp.float32)
    grid = (cfg["V"], cfg["h_r"], cfg["n_chunks"])
    sigma2 = cfg["flat"](sigma)

    if k_chunks > 1:
        assert not static_base, "chunked kernel uses the dynamic form"
        kern = functools.partial(
            _epiband_kernel_chunked, D=n_hyp, s_max=s_max, ws=cfg["ws"],
            M=cfg["M"], Dc=cfg["Dc"], xc=cfg["xc"], n_rows=cfg["h_r"],
            n_chunks=cfg["n_chunks"])
        out = pl.pallas_call(
            kern, grid=grid + (k_chunks,),
            in_specs=[s["fr"], s["fs"], s["row"], s["row"], s["ones"],
                      s["kv"], s["sm"]],
            out_specs=s["out"], out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((cfg["xc"], cfg["ws"]), jnp.float32)],
            interpret=cfg["interpret"],
        )(fr_rect, fs_rect, cfg["flat"](base), sigma2, cfg["ones"],
          cfg["kv"], cfg["sm"])
        return out[..., :n_hyp] if cfg["Dp"] != n_hyp else out

    if static_base:
        kern = functools.partial(
            _epiband_kernel_static, D=n_hyp, s_max=s_max, ws=cfg["ws"],
            M=cfg["M"], W_band=cfg["W_band"],
            xc=cfg["xc"], n_rows=cfg["h_r"], n_chunks=cfg["n_chunks"])
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[s["fr"], s["fs"], s["row"], s["ones"], s["kv"],
                      s["sm"]],
            out_specs=s["out"], out_shape=out_shape,
            interpret=cfg["interpret"],
        )(fr_rect, fs_rect, sigma2, cfg["ones"], cfg["kv"], cfg["sm"])
    else:
        kern = functools.partial(
            _epiband_kernel, D=n_hyp, s_max=s_max, ws=cfg["ws"], M=cfg["M"],
            xc=cfg["xc"], n_rows=cfg["h_r"],
            n_chunks=cfg["n_chunks"])
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[s["fr"], s["fs"], s["row"], s["row"], s["ones"],
                      s["kv"], s["sm"]],
            out_specs=s["out"], out_shape=out_shape,
            interpret=cfg["interpret"],
        )(fr_rect, fs_rect, cfg["flat"](base), sigma2, cfg["ones"],
          cfg["kv"], cfg["sm"])
    return out[..., :n_hyp] if cfg["Dp"] != n_hyp else out


def epiband_resample(
    fr_rect: jnp.ndarray,   # (V, h_r, w_r, C) features (bf16 or f32)
    fs_rect: jnp.ndarray,   # (V, h_r, ws_r, C)
    base: jnp.ndarray,      # (V, h_r, w_r) f32
    sigma: jnp.ndarray,     # (V, h_r, w_r) f32
    n_hyp: int,
    s_max: int,
    sigma_lo: float = 0.0,
    sigma_hi: float = None,
    interpret: bool = False,
    xc: int = None,
    static_base: bool = False,
    k_chunks: int = 1,
) -> jnp.ndarray:
    """(V, h_r, w_r, D) fp32 rect-grid cost volume.

    ``sigma_lo/sigma_hi``: static bounds on ``sigma`` values (scene rate
    bounds x incre).  When ``sigma_hi`` is None the select windows span the
    whole hypothesis band (correct for any sigma, slower).

    ``static_base=True`` asserts ``base == 0`` everywhere (stage-0 slabs
    start at inverse depth 0) and switches to the diagonal-band kernel
    (:func:`_epiband_kernel_static`): ~4x less MXU and ~3x less roll work.

    ``k_chunks > 1`` splits the hypothesis axis into chunks on a 4th grid
    dimension (:func:`_epiband_kernel_chunked`), bounding VMEM as
    ``(D/n_k)^2`` — pick with :func:`pick_k_chunks`; implies the dynamic
    kernel (``static_base`` ignored, pass ``base`` zeros for stage 0).

    Differentiable w.r.t. ``fr_rect``/``fs_rect`` (Pallas backward kernels);
    ``base``/``sigma`` receive zero gradient (reference parity: the CUDA
    backward never writes ``coords_grad``, ``correlation_kernel.cu:307,323``).
    """
    if sigma_hi is None:
        sigma_hi = float(s_max) / max(n_hyp - 1, 1)
        sigma_lo = 0.0
    if k_chunks and k_chunks > 1:
        static_base = False
    return _epiband_vjp(
        fr_rect, fs_rect, base, sigma, int(n_hyp), int(s_max),
        float(sigma_lo), float(sigma_hi), bool(interpret),
        int(xc) if xc else 0, bool(static_base), int(k_chunks or 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _epiband_vjp(fr_rect, fs_rect, base, sigma, n_hyp, s_max, sigma_lo,
                 sigma_hi, interpret, xc, static_base, k_chunks):
    return _epiband_fwd_impl(fr_rect, fs_rect, base, sigma, n_hyp, s_max,
                             sigma_lo, sigma_hi, interpret, xc or None,
                             static_base, k_chunks)


def _epiband_vjp_fwd(fr_rect, fs_rect, base, sigma, n_hyp, s_max, sigma_lo,
                     sigma_hi, interpret, xc, static_base, k_chunks):
    out = _epiband_fwd_impl(fr_rect, fs_rect, base, sigma, n_hyp, s_max,
                            sigma_lo, sigma_hi, interpret, xc or None,
                            static_base, k_chunks)
    return out, (fr_rect, fs_rect, base, sigma)


def _epiband_vjp_bwd(n_hyp, s_max, sigma_lo, sigma_hi, interpret, xc,
                     static_base, k_chunks, res, dout):
    fr_rect, fs_rect, base, sigma = res
    dfr, dfs = _epiband_bwd_impl(
        fr_rect, fs_rect, base, sigma, dout, n_hyp, s_max, sigma_lo,
        sigma_hi, interpret, xc or None, static_base, k_chunks)
    return (dfr.astype(fr_rect.dtype), dfs.astype(fs_rect.dtype),
            jnp.zeros_like(base), jnp.zeros_like(sigma))


_epiband_vjp.defvjp(_epiband_vjp_fwd, _epiband_vjp_bwd)


def _d_window(dout_ref, ones_ref, kv_ref, sm_ref, rel0, sigma, xc, M):
    """Transpose of the hat/segment-sum stage, Mosaic-friendly (no dynamic
    slices): expand dout to concatenated-window space with the transposed
    segment matmul (d_prod[:, j] = dout[:, k(j)]), apply the hat weights
    vectorized over the window lanes (k(j)/m(j) are static lane maps in
    kv_ref), then segment-sum per WINDOW COLUMN with a second static 0/1
    matmul.  Returns d_av (xc, M) = sum_k hat_k(m) * dout[:, k].
    """
    dout = dout_ref[0, 0]                               # (xc, Dp) f32
    hi = ones_ref.dtype == jnp.float32
    d_prod = jax.lax.dot_general(
        dout.astype(ones_ref.dtype), ones_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if hi
                   else jax.lax.Precision.DEFAULT))     # (xc, total)
    km = kv_ref[0:1, :]                                 # (1, total) k(j)
    mm = kv_ref[1:2, :]                                 # (1, total) m(j)
    rel = rel0 - km * sigma                             # (xc, total)
    wgt = jnp.maximum(1.0 - jnp.abs(mm - rel), 0.0)
    wprod = (d_prod * wgt).astype(sm_ref.dtype)
    return jax.lax.dot_general(
        wprod, sm_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if hi
                   else jax.lax.Precision.DEFAULT))[:, :M]  # (xc, M)


def _epiband_bwd_kernel(fs_ref, fr_ref, base_ref, sigma_ref, ones_ref,
                        kv_ref, sm_ref, dout_ref, dfr_ref, dfs_ref, *, D,
                        s_max, ws, M, xc, n_rows, n_chunks):
    """Backward of :func:`_epiband_kernel` for one (view, row, x-chunk).

    dG[x, (c(x)+m) mod ws] = valid * sum_k hat_k(m) * dout[x, k]; then
    dfr = dG @ fs and dfs += dG^T @ fr (accumulated over x-chunks into the
    revisited (view, row) output block).
    """
    xchunk = pl.program_id(2)
    r = ((pl.program_id(0) * n_rows + pl.program_id(1)) * n_chunks
         + pl.program_id(2))
    base = base_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    sigma = sigma_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    xg = (jax.lax.broadcasted_iota(jnp.int32, (xc, 1), 0).astype(jnp.float32)
          + (xchunk * xc).astype(jnp.float32))
    p0 = xg + float(s_max) - base
    c = jnp.floor(p0).astype(jnp.int32) - (M - 2)
    c = jnp.clip(c, -M, ws - 1)
    rel0 = p0 - c.astype(jnp.float32)
    cpos = jnp.where(c < 0, c + ws, c)

    d_av = _d_window(dout_ref, ones_ref, kv_ref, sm_ref, rel0, sigma, xc, M)

    miota = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    s_abs = c + miota
    valid = ((s_abs >= 0) & (s_abs <= ws - 1)).astype(jnp.float32)
    d_av = d_av * valid

    # inverse barrel alignment (right-rotate by cpos, two-level: residual
    # bits on the narrow array first, then 128-quantized full-width rolls —
    # the exact inverse of the forward ladder; wrapped positions carry zeros
    # thanks to the validity mask)
    Wn = min(M + 128, ws)
    buf = jnp.concatenate(
        [d_av, jnp.zeros((xc, Wn - M), jnp.float32)], axis=1)
    for b in range(7):
        amt = 1 << b
        if amt >= ws:
            break
        bit = (cpos & amt) > 0
        buf = jnp.where(bit, pltpu.roll(buf, amt, axis=1), buf)
    dG = jnp.concatenate(
        [buf, jnp.zeros((xc, ws - Wn), jnp.float32)], axis=1)
    for b in range(max(1, math.ceil(math.log2(-(-ws // 128))))):
        amt = 128 << b
        if amt >= ws:
            break
        bit = (cpos & amt) > 0
        dG = jnp.where(bit, pltpu.roll(dG, amt, axis=1), dG)

    fs = fs_ref[0, 0]                                   # (ws, C)
    fr = fr_ref[0, 0]                                   # (xc, C)
    if fs.dtype == jnp.float32:
        dfr = jax.lax.dot_general(
            dG, fs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        contrib = jax.lax.dot_general(
            dG, fr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    else:
        dGb = dG.astype(jnp.bfloat16)
        dfr = jax.lax.dot_general(
            dGb, fs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        contrib = jax.lax.dot_general(
            dGb, fr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    dfr_ref[0, 0, :, :] = dfr

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dfs_ref[0, 0, :, :] = contrib

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        dfs_ref[0, 0, :, :] = dfs_ref[0, 0, :, :] + contrib


def _epiband_bwd_kernel_chunked(fs_ref, fr_ref, base_ref, sigma_ref,
                                ones_ref, kv_ref, sm_ref, dout_ref, dfr_ref,
                                dfs_ref, dG_ref, *, D, s_max, ws, M, Dc, xc,
                                n_rows, n_chunks, n_k):
    """Backward of :func:`_epiband_kernel_chunked`: each chunk expands its
    dout slice through the (chunk-shared) hat/segment maps, inverse-aligns
    at ITS k0 position, and accumulates into a scratch dG; the final chunk
    does the dfr/dfs matmuls once."""
    kc = pl.program_id(3)
    x_id = pl.program_id(2)  # hoisted: program_id inside nested pl.when
    # bodies escapes the interpret-mode substitution
    r = ((pl.program_id(0) * n_rows + pl.program_id(1)) * n_chunks
         + x_id)
    base = base_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    sigma = sigma_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    xg = (jax.lax.broadcasted_iota(jnp.int32, (xc, 1), 0).astype(jnp.float32)
          + (pl.program_id(2) * xc).astype(jnp.float32))
    k0 = (kc * Dc).astype(jnp.float32)
    p0 = xg + float(s_max) - base - k0 * sigma
    c = jnp.floor(p0).astype(jnp.int32) - (M - 2)
    c = jnp.clip(c, -M, ws - 1)
    rel0 = p0 - c.astype(jnp.float32)
    cpos = jnp.where(c < 0, c + ws, c)

    d_av = _d_window(dout_ref, ones_ref, kv_ref, sm_ref, rel0, sigma, xc, M)

    miota = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    s_abs = c + miota
    valid = ((s_abs >= 0) & (s_abs <= ws - 1)).astype(jnp.float32)
    d_av = d_av * valid

    Wn = min(M + 128, ws)
    buf = jnp.concatenate(
        [d_av, jnp.zeros((xc, Wn - M), jnp.float32)], axis=1)
    for b in range(7):
        amt = 1 << b
        if amt >= ws:
            break
        bit = (cpos & amt) > 0
        buf = jnp.where(bit, pltpu.roll(buf, amt, axis=1), buf)
    dG = jnp.concatenate(
        [buf, jnp.zeros((xc, ws - Wn), jnp.float32)], axis=1)
    for b in range(max(1, math.ceil(math.log2(-(-ws // 128))))):
        amt = 128 << b
        if amt >= ws:
            break
        bit = (cpos & amt) > 0
        dG = jnp.where(bit, pltpu.roll(dG, amt, axis=1), dG)

    @pl.when(kc == 0)
    def _init_dg():
        dG_ref[:, :] = dG

    @pl.when(kc != 0)
    def _acc_dg():
        dG_ref[:, :] = dG_ref[:, :] + dG

    @pl.when(kc == n_k - 1)
    def _emit():
        dG_t = dG_ref[:, :]
        fs = fs_ref[0, 0]
        fr = fr_ref[0, 0]
        if fs.dtype == jnp.float32:
            dfr = jax.lax.dot_general(
                dG_t, fs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            contrib = jax.lax.dot_general(
                dG_t, fr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            dGb = dG_t.astype(jnp.bfloat16)
            dfr = jax.lax.dot_general(
                dGb, fs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            contrib = jax.lax.dot_general(
                dGb, fr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        dfr_ref[0, 0, :, :] = dfr

        @pl.when(x_id == 0)
        def _init():
            dfs_ref[0, 0, :, :] = contrib

        @pl.when(x_id != 0)
        def _acc():
            dfs_ref[0, 0, :, :] = dfs_ref[0, 0, :, :] + contrib


def _epiband_bwd_kernel_static(fs_ref, fr_ref, sigma_ref, ones_ref, kv_ref,
                               sm_ref, dout_ref, dfr_ref, dfs_ref, *, D,
                               s_max, ws, M, W_band, xc, n_rows, n_chunks):
    """Backward of :func:`_epiband_kernel_static` (zero-base stage 0)."""
    x0 = pl.program_id(2) * xc
    K8 = s_max - M
    start = 8 * jnp.minimum((x0 + K8) // 8, (ws - W_band) // 8)
    r = ((pl.program_id(0) * n_rows + pl.program_id(1)) * n_chunks
         + pl.program_id(2))
    sigma = sigma_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)

    rel0 = jnp.full((xc, 1), float(M - 2), jnp.float32)
    d_av = _d_window(dout_ref, ones_ref, kv_ref, sm_ref, rel0, sigma, xc, M)

    # inverse per-lane alignment: right-rotate by amt (no wrap, same bound
    # as the forward ladder)
    amt = (jax.lax.broadcasted_iota(jnp.int32, (xc, 1), 0)
           + (x0 + K8 + 2 - start))
    max_amt = (xc + 1
               + max(0, (n_chunks - 1) * xc + K8 + W_band - ws))
    d_band = jnp.concatenate(
        [d_av, jnp.zeros((xc, W_band - M), jnp.float32)], axis=1)
    nbits = max(1, math.ceil(math.log2(max_amt + 1)))
    for b in range(nbits):
        a = 1 << b
        bit = (amt & a) > 0
        d_band = jnp.where(bit, pltpu.roll(d_band, a % W_band, axis=1),
                           d_band)

    fr = fr_ref[0, 0]                                   # (xc, C)
    fs_band = fs_ref[0, 0, pl.ds(start, W_band), :]     # (W_band, C)
    if fr.dtype == jnp.float32:
        dfr = jax.lax.dot_general(
            d_band, fs_band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        contrib = jax.lax.dot_general(
            d_band, fr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    else:
        dBb = d_band.astype(jnp.bfloat16)
        dfr = jax.lax.dot_general(
            dBb, fs_band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        contrib = jax.lax.dot_general(
            dBb, fr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    dfr_ref[0, 0, :, :] = dfr

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dfs_ref[0, 0, :, :] = jnp.zeros_like(dfs_ref[0, 0, :, :])

    cur = dfs_ref[0, 0, pl.ds(start, W_band), :]
    dfs_ref[0, 0, pl.ds(start, W_band), :] = cur + contrib


def _epiband_bwd_impl(fr_rect, fs_rect, base, sigma, dout, n_hyp, s_max,
                      sigma_lo, sigma_hi, interpret, xc, static_base,
                      k_chunks=1):
    cfg = _setup(fr_rect, fs_rect, n_hyp, s_max, sigma_lo, sigma_hi,
                 interpret, xc, static_base, k_chunks)
    s = cfg["specs"]
    Dp = cfg["Dp"]
    if Dp != n_hyp:
        dout = jnp.pad(dout, ((0, 0),) * 3 + ((0, Dp - n_hyp),))
    dout = dout.astype(jnp.float32)
    grid = (cfg["V"], cfg["h_r"], cfg["n_chunks"])
    sigma2 = cfg["flat"](sigma)
    C = cfg["C"]
    dfr_shape = jax.ShapeDtypeStruct(
        (cfg["V"], cfg["h_r"], cfg["w_r"], C), jnp.float32)
    dfs_shape = jax.ShapeDtypeStruct(
        (cfg["V"], cfg["h_r"], cfg["ws"], C), jnp.float32)
    if k_chunks > 1:
        dfs_spec = pl.BlockSpec((1, 1, cfg["ws"], C),
                                lambda v, y, x, kc: (v, y, 0, 0),
                                memory_space=pltpu.VMEM)
        dout_spec = pl.BlockSpec((1, 1, cfg["xc"], Dp),
                                 lambda v, y, x, kc: (v, y, x, 0),
                                 memory_space=pltpu.VMEM)
        kern = functools.partial(
            _epiband_bwd_kernel_chunked, D=n_hyp, s_max=s_max, ws=cfg["ws"],
            M=cfg["M"], Dc=cfg["Dc"], xc=cfg["xc"], n_rows=cfg["h_r"],
            n_chunks=cfg["n_chunks"], n_k=k_chunks)
        dfr, dfs = pl.pallas_call(
            kern, grid=grid + (k_chunks,),
            in_specs=[s["fs"], s["fr"], s["row"], s["row"], s["ones"],
                      s["kv"], s["sm"], dout_spec],
            out_specs=[s["fr"], dfs_spec],
            out_shape=[dfr_shape, dfs_shape],
            scratch_shapes=[pltpu.VMEM((cfg["xc"], cfg["ws"]), jnp.float32)],
            interpret=cfg["interpret"],
        )(fs_rect, fr_rect, cfg["flat"](base), sigma2, cfg["ones"],
          cfg["kv"], cfg["sm"], dout)
        return dfr, dfs
    dfs_spec = pl.BlockSpec((1, 1, cfg["ws"], C), lambda v, y, x: (v, y, 0, 0),
                            memory_space=pltpu.VMEM)
    dout_spec = pl.BlockSpec((1, 1, cfg["xc"], Dp),
                             lambda v, y, x: (v, y, x, 0),
                             memory_space=pltpu.VMEM)

    if static_base:
        kern = functools.partial(
            _epiband_bwd_kernel_static, D=n_hyp, s_max=s_max, ws=cfg["ws"],
            M=cfg["M"], W_band=cfg["W_band"], xc=cfg["xc"],
            n_rows=cfg["h_r"], n_chunks=cfg["n_chunks"])
        dfr, dfs = pl.pallas_call(
            kern, grid=grid,
            in_specs=[s["fs"], s["fr"], s["row"], s["ones"], s["kv"],
                      s["sm"], dout_spec],
            out_specs=[s["fr"], dfs_spec],
            out_shape=[dfr_shape, dfs_shape],
            interpret=cfg["interpret"],
        )(fs_rect, fr_rect, sigma2, cfg["ones"], cfg["kv"], cfg["sm"], dout)
    else:
        kern = functools.partial(
            _epiband_bwd_kernel, D=n_hyp, s_max=s_max, ws=cfg["ws"],
            M=cfg["M"], xc=cfg["xc"], n_rows=cfg["h_r"],
            n_chunks=cfg["n_chunks"])
        dfr, dfs = pl.pallas_call(
            kern, grid=grid,
            in_specs=[s["fs"], s["fr"], s["row"], s["row"], s["ones"],
                      s["kv"], s["sm"], dout_spec],
            out_specs=[s["fr"], dfs_spec],
            out_shape=[dfr_shape, dfs_shape],
            interpret=cfg["interpret"],
        )(fs_rect, fr_rect, cfg["flat"](base), sigma2, cfg["ones"],
          cfg["kv"], cfg["sm"], dout)
    return dfr, dfs
