"""Attribute AMD step time: occlusion, flownet fwd, unflow loss, full fwd, bwd."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _log(m):
    print(f"[prof] {m}", file=sys.stderr, flush=True)


def timeit(fn, *args, n=6):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(2):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2 + n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    tn = time.perf_counter() - t0
    return (tn - t2) / n


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rcf_tpu.config import load_config
    from rcf_tpu.losses.unflow import UnFlowLossCfg, unflow_loss
    from rcf_tpu.models.amd import build_amd_model
    from rcf_tpu.models.amd.amd_model import _FLOW_CFG
    from rcf_tpu.ops.warp import occu_mask_backward

    dtype = jnp.bfloat16
    cfg = load_config("configs/amd/amd.yaml")
    model = build_amd_model(cfg.model_kwargs.to_dict(), dtype=dtype)

    rng = np.random.default_rng(0)
    b, hw = 8, 384
    imgs = jnp.asarray(rng.standard_normal((b, 2, hw, hw, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                           imgs[:2], train=True)

    flow_full = jnp.asarray((rng.standard_normal((b, 384, 640, 2)) * 5).astype(np.float32))

    occ = jax.jit(lambda f: occu_mask_backward(f, 0.2))
    _log(f"occu_mask_backward full-res x2: {timeit(lambda f: (occ(f), occ(-f)), flow_full)*1000:.1f} ms")

    im1 = jnp.asarray(rng.random((b, 384, 640, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.random((b, 384, 640, 3)).astype(np.float32))
    pyr = [jnp.asarray((rng.standard_normal((b, 384 // s, 640 // s, 4)) * 3).astype(np.float32))
           for s in (4, 8, 16, 32, 64)]

    loss_fn = jax.jit(lambda p, a, c: unflow_loss(p, a, c, _FLOW_CFG)[0])
    _log(f"unflow_loss x2 (both dirs stacked): {timeit(lambda: (loss_fn(pyr, im1, im2), loss_fn(pyr, im2, im1)))*1000:.1f} ms")

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                           rngs={"dropout": jax.random.PRNGKey(2)},
                                           mutable=["batch_stats"])[0][0]["loss"])
    _log(f"full fwd: {timeit(fwd, variables, imgs)*1000:.1f} ms")

    grad = jax.jit(jax.grad(lambda p, x: model.apply(
        {"params": p, "batch_stats": variables["batch_stats"]}, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])[0][0]["loss"]))
    _log(f"fwd+bwd: {timeit(grad, variables['params'], imgs)*1000:.1f} ms")


if __name__ == "__main__":
    main()
