"""Cascaded epipolar RAFT model — the flagship depth-regression network.

TPU-native re-design of ``/root/reference/core/raft.py``:

* the python GRU loop (``core/raft.py:96-103``) becomes ``nn.scan`` (a single
  compiled ``lax.scan`` body per cascade stage, optionally rematerialized for
  memory) instead of 8 unrolled graph copies;
* mixed precision follows the reference's autocast layout
  (``core/raft.py:55,83,98``): encoders + GRU in bfloat16, the cost volume in
  an fp32 island — on TPU no loss scaler is needed;
* test-time memory control (per-frame fnet loop, chunked lookups,
  ``core/raft.py:63-69``/``core/corr.py:123-139``) becomes static
  scan-over-frames and hypothesis-chunked volume construction.

Cascade semantics preserved (``core/raft.py:14-22,76-104``):
  * stages ``(D, N, T)``: D hypotheses (-1 -> auto ``(2r+1)*2^(levels-1)``),
    spacing ``incre = 0.0025 / N``, T GRU iterations;
  * stage 0 shifts the slab origin away from the zero init, later stages
    center it on the current estimate;
  * disparity is detached at each iteration start; predictions accumulate
    ``disp + delta``;
  * test mode returns ``disp * scale`` (``core/raft.py:106-108``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cermvs_tpu.config import configurable
from cermvs_tpu.models.extractor import BasicEncoder
from cermvs_tpu.models.update import UpdateBlock
from cermvs_tpu.ops import corr as corr_ops


@configurable("RAFT")
class RAFT(nn.Module):
    """images (B, N, H, W, 3) in [0, 255], poses (B, N, 4, 4) w2c,
    intrinsics (B, N, 3, 3); returns per-iteration disparity predictions
    (train) or the final scaled disparity map (test)."""

    cascade: Sequence[Tuple[int, int, int]] = ((64, 64, 8), (-1, 320, 8))
    encoder_type: str = "HR"
    dim_fmap: int = 64
    dim_net: int = 64
    dim_inp: int = 64
    test_mode: bool = False
    num_levels: int = 3
    radius: int = 5
    hyp_chunk: int = 16
    remat: bool = True
    unroll_iters: bool = False
    # frames per feature-encoder scan step: per-frame scanning serializes
    # 22 small convs behind each other (measured 449 ms fwd+bwd vs 87 ms
    # fully batched at the DTU quarter crop, benchmarks/profile_encoder.py);
    # chunked-batched scanning with remat per chunk recovers the batching
    # while keeping live activations ~chunk-bounded.  None => auto: 8 in
    # training, 1 in test mode (scale-2 inference frames are 4x larger and
    # memory-bound).
    encoder_chunk: Optional[int] = None
    # "banded" (gather-free XLA), "pallas" (fused kernel, pools in-VMEM,
    # no pyramid storage), or "gather" (reference-style interp fallback)
    lookup_impl: str = "banded"
    # multi-view aggregation of correlation features (core/update.py:101-109)
    aggregation: Sequence[str] = ("mean",)
    # debug/testing: keep per-view volumes even when mean aggregation would
    # allow folding the view average into the volume
    force_per_view_volumes: bool = False
    dtype: Any = jnp.bfloat16
    # pluggable cost-volume builder (e.g. the Pallas kernel); must match
    # ops.corr.build_corr_volume's signature
    volume_fn: Optional[Any] = None

    def setup(self):
        self.fnet = BasicEncoder(
            output_dim=self.dim_fmap, norm_fn="instance",
            type=self.encoder_type, dtype=self.dtype, name="fnet")
        self.cnet = BasicEncoder(
            output_dim=self.dim_net + self.dim_inp, norm_fn="none",
            type=self.encoder_type, dtype=self.dtype, name="cnet")
        self.update_block = UpdateBlock(
            cascade=self.cascade, dim_net=self.dim_net, dim_inp=self.dim_inp,
            num_levels=self.num_levels, radius=self.radius,
            aggregation=self.aggregation, dtype=self.dtype,
            name="update_block")

    @property
    def mean_volume(self) -> bool:
        """Mean is the only aggregation => fold it into the volume: the
        lookup index depends only on the shared reference disparity, so
        lookups of the view-averaged volume equal the average of per-view
        lookups exactly (see ops.corr.build_corr_volume_from)."""
        return (tuple(self.aggregation) == ("mean",)
                and not self.force_per_view_volumes)

    @property
    def stride_factor(self) -> int:
        return 8 if self.encoder_type == "LR" else 4

    def _auto_hyps(self, n: int) -> int:
        if n == -1:
            return (2 * self.radius + 1) * 2 ** (self.num_levels - 1)
        return n

    def __call__(self, images, poses, intrinsics, scale=None):
        B, N, H, W, _ = images.shape
        factor = self.stride_factor
        h, w = H // factor, W // factor
        V = N - 1

        if scale is not None:
            scale = jnp.asarray(scale, jnp.float32).reshape(B, 1, 1)
            # scale scene translations (core/raft.py:35); (B,1,1) -> (B,N,3)
            poses = poses.at[..., :3, 3].multiply(scale)

        intrinsics = intrinsics.at[:, :, :2].divide(float(factor))
        images = images.astype(jnp.float32) * (2.0 / 255.0) - 1.0

        ii = jnp.zeros(V, jnp.int32)
        jj = jnp.arange(1, N, dtype=jnp.int32)

        def cnet_fn(mdl, img):
            return mdl.cnet(img)

        # remat the encoders: their per-layer activations at training crops
        # pad 32 channels to 128 lanes (4x) and dominate HBM if saved
        cnet_fn = nn.remat(cnet_fn) if self.remat else cnet_fn
        net_inp = cnet_fn(self, images[:, 0])
        net = jnp.tanh(net_inp[..., : self.dim_net])
        inp = nn.relu(net_inp[..., self.dim_net :])

        # chunk-scan the feature encoder over frames: bounds peak memory in
        # BOTH modes (replaces the reference's imperative test-time loop at
        # core/raft.py:66-69 and its reliance on 24GB GPUs for training)
        # while batching `chunk` frames per conv call for MXU utilization
        # (per-frame scanning measured 5x slower fwd+bwd; see encoder_chunk)
        if self.encoder_chunk:
            chunk = self.encoder_chunk
        elif not self.test_mode:
            chunk = 8
        else:
            # test mode: no backward, so live activations are ~2 tensors per
            # chunk frame (~64 MB/frame bf16 at DTU scale 1) — batch ALL
            # frames in one conv call (a single-step scan): the multi-step
            # scan measured ~2x slower for 11 frames at scale 1 (217 vs
            # 113 ms, chunk 4 vs 12).  Scale-2 frames are 4x that next to
            # multi-GB volumes — stay per-frame there.  H, W are static at
            # trace time, so this branches per shape bucket, not per value.
            chunk = B * N if H * W <= 2_100_000 else 1
        total = B * N
        chunk = min(chunk, total)
        frames = images.reshape(total, H, W, 3)
        pad = -total % chunk
        if pad:
            frames = jnp.concatenate(
                [frames, jnp.zeros((pad,) + frames.shape[1:],
                                   frames.dtype)], axis=0)

        def encode(mdl, carry, fr):
            return carry, mdl.fnet(fr)

        encode = nn.remat(encode) if self.remat else encode
        fmaps = nn.scan(
            encode, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=0, out_axes=0,
        )(self, (), frames.reshape(-1, chunk, H, W, 3))[1]
        fmaps = fmaps.reshape(-1, h, w, fmaps.shape[-1])[:total]
        fmaps = fmaps.reshape(B, N, h, w, -1).astype(jnp.float32)

        disp = jnp.zeros((B, h, w, 1), jnp.float32)
        predictions = []

        for stage, (n_hyp, n_div, n_iters) in enumerate(self.cascade):
            n_hyp = self._auto_hyps(n_hyp)
            incre = 0.0025 / n_div

            # fp32 island: cost volume built on the detached estimate
            pyr = corr_ops.build_corr_pyramid(
                fmaps, poses, intrinsics, ii, jj,
                jax.lax.stop_gradient(disp)[..., 0][:, None],  # (B,1,h,w)
                n_hyp, incre, shift=(stage == 0),
                num_levels=self.num_levels, hyp_chunk=self.hyp_chunk,
                volume_fn=self.volume_fn,
                materialize_pyramid=(self.lookup_impl != "pallas"),
                mean_over_views=self.mean_volume,
                # fmaps are computed in self.dtype then upcast, so gathering
                # the corner buffer in that dtype is LOSSLESS (fp32
                # accumulation) while halving the dominant HBM random reads
                gather_dtype=self.dtype,
                # stage 0 builds on the zero-init disparity, so the shifted
                # slab origin is statically (D//2)*incre everywhere
                zero_slab=(stage == 0),
            )
            Vv = 1 if self.mean_volume else V
            # loop-invariant GRU gate contributions of the context features:
            # computed once per stage, closed over by the scan body
            g_ctx = self.update_block.gru_ctx(inp, stage)

            def body(mdl, carry, _, _pyr=pyr, _inp=inp, _stage=stage,
                     _Vv=Vv, _gctx=g_ctx):
                net, disp = carry
                disp = jax.lax.stop_gradient(disp)
                zinv = jnp.broadcast_to(
                    disp[..., 0][:, None], (B, _Vv, h, w))
                corr_frames = corr_ops.lookup(
                    _pyr, zinv, mdl.radius, impl=mdl.lookup_impl)
                net, delta = mdl.update_block(
                    net, _inp, disp, corr_frames, _stage, gru_ctx=_gctx)
                disp = disp + delta
                return (net, disp), disp

            if self.unroll_iters:
                carry = (net, disp)
                for _ in range(n_iters):
                    carry, pred = body(self, carry, None)
                    predictions.append(pred)
                net, disp = carry
            else:
                fn = nn.remat(body, static_argnums=()) if self.remat else body
                (net, disp), preds = nn.scan(
                    fn, variable_broadcast="params",
                    split_rngs={"params": False}, length=n_iters,
                )(self, (net, disp), None)
                predictions.append(preds)  # (T, B, h, w, 1)

        if self.test_mode:
            out = disp[..., 0]  # (B, h, w)
            if scale is not None:
                out = out * scale
            return out

        if self.unroll_iters:
            return jnp.stack([p[..., 0] for p in predictions], axis=0)
        return jnp.concatenate(predictions, axis=0)[..., 0]  # (T_total, B, h, w)
