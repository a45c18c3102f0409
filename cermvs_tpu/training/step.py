"""Jitted training step with data-parallel sharding.

Replaces the reference's ``nn.DataParallel`` + GradScaler loop body
(``/root/reference/train.py:66-92``): one compiled step — forward, sequence
loss, backward, global-norm clip, AdamW update — with the batch sharded over
the mesh's ``data`` axis and gradients reduced by pjit-inserted all-reduce
over ICI/DCN.  No loss scaler (bf16 on TPU needs none).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cermvs_tpu.training.loss import sequence_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def init_state(model, tx, rng, sample_batch) -> TrainState:
    # jitted init: eager flax init dispatches per-op (slow through the
    # tunneled backend) and materializes the full forward's intermediates
    variables = jax.jit(model.init)(
        rng, sample_batch["images"], sample_batch["poses"],
        sample_batch["intrinsics"])
    params = variables["params"]
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def disp_ground_truth(depths: jnp.ndarray) -> jnp.ndarray:
    """Reference-view inverse depth with zeros kept invalid
    (``train.py:70-72``). depths: (B, N, H, W) -> (B, H, W)."""
    d = depths[:, 0]
    return jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)


def make_train_step(model, tx, mesh: Optional[Mesh] = None, donate: bool = True):
    """Build the jitted train step.

    Batch dict: images (B,N,H,W,3), depths (B,N,H,W), poses (B,N,4,4),
    intrinsics (B,N,3,3); gradual_weight scalar (curriculum, train.py:76-79).

    With a mesh, the gradient computation runs under ``shard_map`` over the
    (data, view) axes: each device applies the model to its LOCAL batch
    shard only, then grads/loss are ``pmean``-reduced over ICI.  This — not
    GSPMD sharding of a global-batch graph — is what lets per-sample host
    constructions (the rectified volume builder's static python loop over
    samples, ``ops/corr_rectified.py:189-210``) run per-local-sample: under
    GSPMD the builder's ``fmaps[b:b+1]`` slices cross shard boundaries and
    serialize.  The loss is a uniform mean over (B, H, W)
    (``training/loss.py:55-57``), so pmean over equal shards is exactly the
    global loss; the valid-masked metrics are reweighted by local/global
    valid-pixel counts before psum so they too match the single-device
    values bitwise-modulo reduction order.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], gradual_weight):
        def loss_fn(params):
            preds = model.apply(
                {"params": params}, batch["images"], batch["poses"],
                batch["intrinsics"])
            disp_gt = disp_ground_truth(batch["depths"])
            return sequence_loss(preds, disp_gt, gradual_weight)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    axes = ("data", "view")
    data_spec = P(axes)

    def local_grads(params, batch, gradual_weight):
        def loss_fn(params):
            preds = model.apply(
                {"params": params}, batch["images"], batch["poses"],
                batch["intrinsics"])
            disp_gt = disp_ground_truth(batch["depths"])
            return sequence_loss(preds, disp_gt, gradual_weight)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        loss = jax.lax.pmean(loss, axes)
        grads = jax.lax.pmean(grads, axes)
        # sequence_loss normalizes its metrics by the LOCAL shard's valid
        # count; reweight by local/global counts so psum gives the exact
        # global metric
        denom = jnp.maximum(
            (batch["depths"][:, 0] > 0).sum().astype(jnp.float32), 1.0)
        w = denom / jax.lax.psum(denom, axes)
        metrics = {k: jax.lax.psum(v * w, axes) for k, v in metrics.items()}
        return loss, metrics, grads

    sharded_grads = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), data_spec, P()),
        out_specs=(P(), P(), P()),
        check_vma=False)

    def dp_step_fn(state: TrainState, batch, gradual_weight):
        loss, metrics, grads = sharded_grads(
            state.params, batch, jnp.asarray(gradual_weight, jnp.float32))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), metrics

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, data_spec)
    return jax.jit(
        dp_step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh):
    """Place a host batch onto the mesh, sharded over the data axis.

    Multi-host: each process passes its LOCAL portion of the global batch
    (host-local sharded loading, replacing the reference's DataLoader
    workers); the global array is assembled across processes.
    """
    sh = NamedSharding(mesh, P(("data", "view")))
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sh, v)
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
