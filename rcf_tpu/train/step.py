"""Jitted train / eval steps (global-view SPMD over the data mesh).

One fused XLA computation per optimizer step: forward (both frames
batched), all losses, backward, Adam update, EMA lerp — the reference's
separate EMA update pass (`rcf_model.py:525-529`) and Lightning optimizer
hooks collapse into the same program. Gradient all-reduce and SyncBN
reductions are inserted by XLA from the batch sharding.

The stage-2.1 CRF target is produced inside the step as well: EMA forward
(eval mode) → object-channel mask → mean-field CRF (`ops/crf.py`) on the
un-normalized images → resized target (`rcf_model.py:496-523`), removing
the reference's per-image Python loop (`models/crf_head.py:102-105`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import resize_bilinear
from .state import TrainState, ema_subtrees, ema_update


def make_train_step(model, donate: bool = True, crf_fn=None):
    """Build the jitted train step.

    crf_fn: optional callable (imgs_flat [N,H,W,3] normalized, masks [N,H,W])
    -> refined [N,H,W] float; required when model.w_crf > 0.
    """
    if model.w_crf > 0 and crf_fn is None:
        raise ValueError("model has w_crf > 0 but no crf_fn was provided")

    def _crf_targets(state: TrainState, imgs: jnp.ndarray, params, batch_stats, dropout_rng,
                     object_channel):
        b, i = imgs.shape[:2]
        imgs_flat = imgs.reshape(b * i, *imgs.shape[2:])
        if model.crf_use_ema:
            variables = {"params": state.ema_params, "batch_stats": state.ema_stats}
            probs = model.apply(variables, imgs_flat, train=False, method=model.mask_probs)
        else:
            variables = {"params": params, "batch_stats": batch_stats}
            probs = model.apply(
                variables, imgs_flat, train=True, method=model.mask_probs,
                rngs={"dropout": dropout_rng},
            )
            probs = jax.lax.stop_gradient(probs)
        onehot = jax.nn.one_hot(object_channel, probs.shape[-1], dtype=probs.dtype)
        obj = jnp.sum(probs * onehot, axis=-1)  # [N, h, w]
        obj_full = resize_bilinear(obj[..., None], imgs.shape[2:4], model.align_corners)[..., 0]
        refined = crf_fn(imgs_flat, obj_full)  # [N, H, W]
        target = resize_bilinear(refined[..., None], tuple(model.mask_size), model.align_corners)[..., 0]
        return target.reshape(b, i, *model.mask_size)

    @functools.partial(
        jax.jit,
        static_argnames=("object_channel_set",),
        donate_argnums=(0,) if donate else (),
    )
    def train_step(state: TrainState, batch: dict, dropout_rng, object_channel,
                   object_channel_set: bool = False):
        imgs = batch["imgs"]
        pl_masks = batch.get("pl_masks")

        def loss_fn(params):
            crf_target = None
            if model.w_crf > 0 and object_channel_set:
                crf_target = _crf_targets(
                    state, imgs, params, state.batch_stats, dropout_rng, object_channel
                )
            (losses, probs), new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs,
                gt_fw_flows=batch.get("gt_fw_flows"),
                gt_bw_flows=batch.get("gt_bw_flows"),
                pl_masks=pl_masks,
                crf_target_masks=crf_target,
                object_channel=object_channel,
                object_channel_set=object_channel_set,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            return losses["loss"], (losses, new_vars["batch_stats"])

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        if state.ema_params is not None:
            new_state = new_state.replace(
                ema_params=ema_update(state.ema_params, new_state.params, model.ema_m),
                ema_stats=ema_update(state.ema_stats, new_state.batch_stats, model.ema_m),
            )
        return new_state, losses

    return train_step


def make_scanned_train_step(model, k: int, donate: bool = True, crf_fn=None):
    """K optimizer steps per dispatch via `lax.scan` (identical math).

    Amortizes the per-dispatch overhead (~1 ms through the TPU relay plus
    host-side pytree plumbing) over K steps: the batch dict carries a
    leading scan axis [K, B, ...] (shard the batch axis, axis=1). Losses
    are returned for every sub-step (stacked [K]), so logging granularity
    is preserved. Use `stack_batches` to build the scan batch.
    """
    inner = make_train_step(model, donate=False, crf_fn=crf_fn)
    # Re-jit as one scanned program; the inner jit collapses during tracing.

    @functools.partial(
        jax.jit,
        static_argnames=("object_channel_set",),
        donate_argnums=(0,) if donate else (),
    )
    def scanned(state: TrainState, batches: dict, dropout_rng, object_channel,
                object_channel_set: bool = False):
        def body(s, batch):
            rng = jax.random.fold_in(dropout_rng, s.step)
            s, losses = inner(s, batch, rng, object_channel,
                              object_channel_set=object_channel_set)
            return s, losses

        return jax.lax.scan(body, state, batches, length=k)

    return scanned


def stack_batches(batches: list, mesh=None) -> dict:
    """Stack K host batches into one [K, B, ...] scan batch (sharded on B).

    Multi-process: each host passes its K process-local batch slices and the
    leaves become global arrays via `make_array_from_process_local_data`,
    mirroring `parallel.mesh.shard_batch` (a plain `device_put` of local
    data onto a global sharding would crash under process_count > 1).
    """
    import numpy as np

    out = {}
    for key in batches[0]:
        vals = [b[key] for b in batches]
        if isinstance(vals[0], np.ndarray):
            stacked = np.stack(vals)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sharding = NamedSharding(mesh, P(None, "data"))
                if jax.process_count() > 1:
                    stacked = jax.make_array_from_process_local_data(
                        sharding, stacked)
                else:
                    stacked = jax.device_put(stacked, sharding)
            out[key] = stacked
        else:
            out[key] = vals[0]
    return out


def make_eval_step(model, use_ema: bool = False, out_sharding=None):
    """Jitted mask inference: imgs [B, H, W, 3] -> probs [B, h, w, C].

    out_sharding: optional sharding for the output probs. Under
    process_count > 1 the eval harness passes a *replicated* sharding so
    the probs are all-gathered on device and every host can read the full
    array (host-side metric accumulation then runs identically on every
    process — the reference evaluates on rank 0 only, main.py:180-238).
    """

    @functools.partial(jax.jit, out_shardings=out_sharding)
    def eval_step(state: TrainState, imgs: jnp.ndarray):
        if use_ema:
            variables = {"params": state.ema_params, "batch_stats": state.ema_stats}
        else:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, imgs, train=False, method=model.mask_probs)

    return eval_step
