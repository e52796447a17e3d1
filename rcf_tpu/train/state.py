"""Train state: params, BN stats, Adam + poly LR, EMA trees.

Optimizer parity with the reference (`main.py:294-310`):

* torch ``Adam(lr, weight_decay)`` — weight decay is an L2 term added to the
  gradient *before* the Adam moments (not AdamW), reproduced with
  ``optax.add_decayed_weights`` ahead of ``scale_by_adam``;
* poly LR over *epochs*: ``lr(e) = (base - min) * (1 - e/E)^power + min``
  (`main.py:294-297`), stepped per optimizer step via ``step // steps_per_epoch``.

EMA parity (`models/rcf_model.py:525-529`, `utils/model_utils.py:33-38`):
the backbone and mask head keep an exponential moving average of params
AND BatchNorm statistics, updated every step with momentum ``ema_m``.
Here the EMA is a pair of subtree pytrees updated with a fused
``tree_map`` lerp inside the jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

EMA_SUBTREES = ("backbone2", "decode_head2")


def poly_epoch_schedule(base_lr: float, min_lr: float, power: float, epochs: int, steps_per_epoch: int):
    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        coeff = (1.0 - epoch / epochs) ** power
        return (base_lr - min_lr) * coeff + min_lr

    return schedule


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam/AdamW/SGD + poly schedule; `freeze_backbone` masks the backbone
    out of the update (the reference freezes via requires_grad=False,
    `models/rcf_model.py:94-96`)."""
    name = str(cfg.get("optimizer", "adam")).lower()
    schedule = poly_epoch_schedule(
        base_lr=float(cfg.learning_rate),
        min_lr=float(cfg.lr_scheduler_kwargs.get("min_lr", 0.0)),
        power=float(cfg.lr_scheduler_kwargs.get("power", 0.9)),
        epochs=int(cfg.epochs),
        steps_per_epoch=steps_per_epoch,
    )
    wd = float(cfg.get("weight_decay", 0.0))
    if name == "adam":
        core = optax.scale_by_adam()
    elif name == "adamw":
        core = optax.scale_by_adam()
        # AdamW applies decay after the moment update; reorder below.
    elif name == "sgd":
        core = optax.identity()
    else:
        raise ValueError(f"unsupported optimizer {name}")
    if name == "adamw":
        tx = optax.chain(core, optax.add_decayed_weights(wd), optax.scale_by_learning_rate(schedule))
    else:
        tx = optax.chain(optax.add_decayed_weights(wd), core, optax.scale_by_learning_rate(schedule))

    frozen = set()
    model_kwargs = cfg.get("model_kwargs", {})
    if bool(model_kwargs.get("freeze_backbone", False)):
        frozen.add("backbone2")
    # freeze_flownet (AMD): reference sets requires_grad=False on the
    # PWC-Lite params (`models/fcn_head.py:94-97`); here it's an update mask.
    if bool(model_kwargs.get("decode_head", {}).get("freeze_flownet", False)):
        frozen.add("flownet")
    if frozen:
        def trainable(params):
            return {k: (k not in frozen) for k in params}

        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()}, trainable
        )
    return tx


def fused_adam(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    """torch-Adam-semantics optimizer over ONE flat buffer.

    The optax chain walks the ~300-leaf param tree ~5 times; on TPU that
    costs ~12 ms/step in per-leaf kernel overhead (RESULTS.md ablation).
    Here grads/params are raveled once and the moment/update math runs as
    three large contiguous passes. Exactly the same math as
    `make_optimizer` (add_decayed_weights -> scale_by_adam -> -lr), modulo
    f32 summation order. Enable with `tpu.fused_optimizer: true`.
    """
    from jax.flatten_util import ravel_pytree

    schedule = poly_epoch_schedule(
        base_lr=float(cfg.learning_rate),
        min_lr=float(cfg.lr_scheduler_kwargs.get("min_lr", 0.0)),
        power=float(cfg.lr_scheduler_kwargs.get("power", 0.9)),
        epochs=int(cfg.epochs),
        steps_per_epoch=steps_per_epoch,
    )
    wd = float(cfg.get("weight_decay", 0.0))
    b1, b2, eps = 0.9, 0.999, 1e-8

    def init(params):
        flat, _ = ravel_pytree(params)
        return {
            "m": jnp.zeros_like(flat),
            "v": jnp.zeros_like(flat),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        assert params is not None, "fused_adam needs params (weight decay)"
        gflat, unravel = ravel_pytree(grads)
        pflat, _ = ravel_pytree(params)
        g = gflat + wd * pflat
        count = state["count"] + 1
        m = b1 * state["m"] + (1.0 - b1) * g
        v = b2 * state["v"] + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mhat = m / (1.0 - b1**c)
        vhat = v / (1.0 - b2**c)
        step = (-schedule(state["count"])) * mhat / (jnp.sqrt(vhat) + eps)
        return unravel(step), {"m": m, "v": v, "count": count}

    return optax.GradientTransformation(init, update)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Any = None   # {backbone2, decode_head2} subtrees or None
    ema_stats: Any = None

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def ema_subtrees(tree: Any, copy: bool = False) -> Any:
    """Select the EMA-tracked subtrees; ``copy=True`` materializes fresh
    buffers (required when the result coexists with the source in a donated
    state pytree — aliased buffers would be donated twice)."""
    sub = {k: tree[k] for k in EMA_SUBTREES if k in tree}
    if copy:
        sub = jax.tree_util.tree_map(jnp.array, sub)
    return sub


def ema_update(ema: Any, current: Any, m: float) -> Any:
    """dest = dest * m + src * (1 - m), matching the reference momentum."""
    sub = ema_subtrees(current)
    return jax.tree_util.tree_map(lambda e, c: e * m + c.astype(e.dtype) * (1.0 - m), ema, sub)


def create_train_state(cfg, model, variables, steps_per_epoch: int, with_ema: bool | None = None) -> TrainState:
    use_fused = bool(cfg.get("tpu", {}).get("fused_optimizer", False)) if "tpu" in cfg else False
    if bool(cfg.get("model_kwargs", {}).get("freeze_backbone", False)) or bool(
            cfg.get("model_kwargs", {}).get("decode_head", {}).get("freeze_flownet", False)):
        use_fused = False  # masking needs the tree-structured path
    if use_fused and str(cfg.get("optimizer", "adam")).lower() == "adam":
        tx = fused_adam(cfg, steps_per_epoch)
    else:
        tx = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if with_ema is None:
        with_ema = bool(cfg.model_kwargs.get("backbone2", {}).get("create_ema", False))
    ema_params = ema_subtrees(params, copy=True) if with_ema else None
    ema_stats = ema_subtrees(batch_stats, copy=True) if with_ema else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=ema_params,
        ema_stats=ema_stats,
        tx=tx,
    )
