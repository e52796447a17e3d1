"""Attribute the AMD train-step tail: bare-grad vs grad+aux vs full step.

The bare-grad profile DCEs the logging-only whole-flow loss forward
(`amd_model.py:266` — only the seg loss trains), so its time under-counts
the real step. This script AOT-compiles three growing programs and prints
XLA cost analysis (flops / bytes) next to measured chain time for each:

  a. grad-only            sum of d(loss)/d(params)       (whole-loss DCE'd)
  b. grad+aux             grads + the full losses dict   (whole-loss live)
  c. train step           b + Adam + state threading     (the real program)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _log(m):
    print(f"[attrib] {m}", file=sys.stderr, flush=True)


def chain_time(call, n=10):
    out = call(0)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]

    def run(k):
        t0 = time.perf_counter()
        o = None
        for i in range(k):
            o = call(i)
        np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
        return time.perf_counter() - t0

    t3 = run(3)
    tn = run(3 + n)
    return (tn - t3) / n


def cost(compiled):
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0)), float(c.get("bytes accessed", 0))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rcf_tpu.config import Config, load_config
    from rcf_tpu.models.amd import build_amd_model
    from rcf_tpu.train import create_train_state, make_train_step

    dtype = jnp.bfloat16
    cfg = load_config("configs/amd/amd.yaml")
    model = build_amd_model(cfg.model_kwargs.to_dict(), dtype=dtype)

    rng = np.random.default_rng(0)
    b, hw = 8, 384
    imgs = jnp.asarray(rng.standard_normal((b, 2, hw, hw, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                           imgs[:2], train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def fwd(p, x, rng_):
        (losses, _), _ = model.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            rngs={"dropout": rng_}, mutable=["batch_stats"])
        return losses["loss"], losses

    # a. grad-only: aux dropped -> whole-loss forward is dead code.
    ga = jax.jit(lambda p, x, r: sum(
        jnp.sum(g.astype(jnp.float32))
        for g in jax.tree_util.tree_leaves(jax.grad(lambda q: fwd(q, x, r)[0])(p))))
    # b. grad + full losses dict (whole-loss live, no optimizer).
    def _gb(p, x, r):
        grads, losses = jax.grad(lambda q: fwd(q, x, r), has_aux=True)(p)
        return sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads)), losses
    gb = jax.jit(_gb)

    # c. the real train step.
    tcfg = Config({"optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 1e-6,
                   "epochs": 8, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
                   "model_kwargs": {}})
    state = create_train_state(tcfg, model, variables, steps_per_epoch=100)
    step = make_train_step(model, donate=False)
    oc = jnp.zeros((), jnp.int32)
    batch = {"imgs": imgs}

    for name, make in (
        ("a_grad_only",
         lambda: (ga.lower(params, imgs, jax.random.PRNGKey(0)).compile(),
                  lambda k: ga(params, imgs, jax.random.PRNGKey(100 + k)))),
        ("b_grad_plus_losses",
         lambda: (gb.lower(params, imgs, jax.random.PRNGKey(0)).compile(),
                  lambda k: gb(params, imgs, jax.random.PRNGKey(100 + k)))),
    ):
        compiled, call = make()
        f, by = cost(compiled)
        _log(f"{name}: {f/1e12:.2f} TFLOP, {by/1e9:.2f} GB accessed, "
             f"{chain_time(call)*1000:.1f} ms")

    compiled = step.lower(state, batch, jax.random.PRNGKey(0), oc).compile()
    f, by = cost(compiled)

    holder = {"s": state}

    def call(k):
        holder["s"], losses = step(holder["s"], batch, jax.random.PRNGKey(100 + k), oc)
        return losses["loss"]

    _log(f"c_train_step: {f/1e12:.2f} TFLOP, {by/1e9:.2f} GB accessed, "
         f"{chain_time(call)*1000:.1f} ms")


def donated_variant():
    """c with buffer donation (the production train-loop setting)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rcf_tpu.config import Config, load_config
    from rcf_tpu.models.amd import build_amd_model
    from rcf_tpu.train import create_train_state, make_train_step

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cfg = load_config("configs/amd/amd.yaml")
    model = build_amd_model(cfg.model_kwargs.to_dict(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((8, 2, 384, 384, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                           imgs[:2], train=True)
    tcfg = Config({"optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 1e-6,
                   "epochs": 8, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
                   "model_kwargs": {}})
    state = create_train_state(tcfg, model, variables, steps_per_epoch=100)
    step = make_train_step(model, donate=True)
    oc = jnp.zeros((), jnp.int32)
    batch = {"imgs": imgs}
    holder = {"s": state}

    def call(k):
        holder["s"], losses = step(holder["s"], batch, jax.random.PRNGKey(100 + k), oc)
        return losses["loss"]

    _log(f"c_donated: {chain_time(call)*1000:.1f} ms")


if __name__ == "__main__":
    donated_variant() if "--donated" in sys.argv else main()
