"""Fused flat-buffer Adam must match the optax chain step-for-step."""

import jax
import jax.numpy as jnp
import numpy as np

from rcf_tpu.config import Config
from rcf_tpu.train.state import fused_adam, make_optimizer


def _cfg():
    return Config({
        "optimizer": "adam", "learning_rate": 1e-3, "weight_decay": 1e-4,
        "epochs": 10, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
    })


def test_fused_adam_matches_optax_chain():
    rng = np.random.default_rng(0)
    params = {
        "a": jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32)),
        "b": {"w": jnp.asarray(rng.standard_normal((7,)).astype(np.float32)),
              "s": jnp.asarray(rng.standard_normal(()).astype(np.float32))},
    }
    cfg = _cfg()
    ref_tx = make_optimizer(cfg, steps_per_epoch=3)
    fused_tx = fused_adam(cfg, steps_per_epoch=3)
    p_ref, p_fused = params, params
    s_ref, s_fused = ref_tx.init(params), fused_tx.init(params)
    for k in range(7):  # crosses an epoch boundary (lr change at step 3)
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.standard_normal(p.shape).astype(np.float32)), p_ref)
        u_ref, s_ref = ref_tx.update(grads, s_ref, p_ref)
        import optax

        p_ref = optax.apply_updates(p_ref, u_ref)
        u_fused, s_fused = fused_tx.update(grads, s_fused, p_fused)
        p_fused = optax.apply_updates(p_fused, u_fused)
        for path in (("a",), ("b", "w"), ("b", "s")):
            r, f = p_ref, p_fused
            for key in path:
                r, f = r[key], f[key]
            np.testing.assert_allclose(np.asarray(r), np.asarray(f), rtol=2e-6, atol=1e-7,
                                       err_msg=f"step {k} {path}")
