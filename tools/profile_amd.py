"""Attribute AMD step time: warps, occlusion, flownet, unflow loss, full step.

NOTE: pyramid_flows as consumed by the loss are the ×4-UPSAMPLED flows
(`pwc_lite.py` up4), i.e. full 384x640 at level 0 — profile at those shapes.
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
    from rcf_tpu.losses.unflow import unflow_loss
    from rcf_tpu.models.amd import build_amd_model
    from rcf_tpu.models.amd.amd_model import _FLOW_CFG
    from rcf_tpu.models.amd.pwc_lite import PWCLite
    from rcf_tpu.ops.warp import flow_warp, occu_mask_backward

    dtype = jnp.bfloat16
    cfg = load_config("configs/amd/amd.yaml")
    model = build_amd_model(cfg.model_kwargs.to_dict(), dtype=dtype)

    rng = np.random.default_rng(0)
    b, hw = 8, 384
    imgs = jnp.asarray(rng.standard_normal((b, 2, hw, hw, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                           imgs[:2], train=True)

    im1 = jnp.asarray(rng.random((b, 384, 640, 3)).astype(np.float32)).astype(dtype)
    im2 = jnp.asarray(rng.random((b, 384, 640, 3)).astype(np.float32)).astype(dtype)
    flow_full = jnp.asarray((rng.standard_normal((b, 384, 640, 2)) * 5).astype(np.float32))

    # --- single full-res warp fwd and fwd+bwd ---
    # Every timed jit returns a SCALAR: the axon tunnel transfers the
    # blocking output to host, so returning full arrays times the tunnel,
    # not the TPU.
    warp = jax.jit(lambda x, f: jnp.sum(flow_warp(x, f).astype(jnp.float32)))
    _log(f"flow_warp 8x384x640x3 {dtype.__name__} fwd: "
         f"{timeit(warp, im1, flow_full)*1000:.1f} ms")
    _warp_g = jax.grad(lambda x, f: jnp.sum(flow_warp(x, f).astype(jnp.float32)),
                       argnums=(0, 1))
    warp_g = jax.jit(lambda x, f: sum(jnp.sum(g.astype(jnp.float32)) for g in _warp_g(x, f)))
    _log(f"flow_warp fwd+bwd (d/img + d/flow): {timeit(warp_g, im1, flow_full)*1000:.1f} ms")

    occ = jax.jit(lambda f: jnp.sum(occu_mask_backward(f, 0.2)))
    _log(f"occu_mask_backward full-res x2: "
         f"{timeit(lambda f: (occ(f), occ(-f)), flow_full)*1000:.1f} ms")

    # --- unflow loss at the REAL consumed shapes (full-res level 0) ---
    pyr = [jnp.asarray((rng.standard_normal((b, 384 // s, 640 // s, 4)) * 3).astype(np.float32))
           for s in (1, 2, 4, 8, 16)]
    loss_fn = jax.jit(lambda p, a, c: unflow_loss(p, a, c, _FLOW_CFG)[0])
    _log(f"unflow_loss one call fwd: {timeit(loss_fn, pyr, im1, im2)*1000:.1f} ms")
    _loss_g = jax.grad(lambda p, a, c: unflow_loss(p, a, c, _FLOW_CFG)[0].astype(jnp.float32))
    loss_g = jax.jit(lambda p, a, c: sum(jnp.sum(g.astype(jnp.float32))
                                         for g in jax.tree_util.tree_leaves(_loss_g(p, a, c))))
    _log(f"unflow_loss one call fwd+bwd(d/flows): {timeit(loss_g, pyr, im1, im2)*1000:.1f} ms")

    # --- flownet alone ---
    fnet = PWCLite(mask_layer=5)
    masks = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((b, 96, 96, 5)).astype(np.float32)), -1).astype(dtype)
    fvars = fnet.init(jax.random.PRNGKey(0), im1, im2, masks, masks)

    def _both(res):
        # Consume BOTH directions' full pyramids like the loss does —
        # summing only flows_fw[0] lets XLA DCE most of the network.
        return sum(jnp.sum(f.astype(jnp.float32))
                   for k in ("flows_fw", "flows_bw") for f in res[k])

    fnet_fwd = jax.jit(lambda v, a, c, m: _both(fnet.apply(v, a, c, m, m, with_bk=True)))
    _log(f"flownet fwd (both dirs): {timeit(fnet_fwd, fvars, im1, im2, masks)*1000:.1f} ms")
    _fnet_g = jax.grad(lambda p, a, c, m: _both(
        fnet.apply({"params": p}, a, c, m, m, with_bk=True)))
    fnet_g = jax.jit(lambda p, a, c, m: sum(jnp.sum(g.astype(jnp.float32))
                                            for g in jax.tree_util.tree_leaves(_fnet_g(p, a, c, m))))
    _log(f"flownet fwd+bwd (both dirs): {timeit(fnet_g, fvars['params'], im1, im2, masks)*1000:.1f} ms")

    # --- backbone+mask head alone ---
    bb = jax.jit(lambda v, x: jnp.sum(model.apply(
        v, x.reshape(-1, *x.shape[2:]), train=True, method=model.mask_probs,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])[0].astype(jnp.float32)))
    _log(f"backbone+head fwd (16x384^2): {timeit(bb, variables, imgs)*1000:.1f} ms")
    _bb_g = jax.grad(lambda p, x: jnp.sum(model.apply(
        {"params": p, "batch_stats": variables["batch_stats"]},
        x.reshape(-1, *x.shape[2:]), train=True, method=model.mask_probs,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])[0].astype(jnp.float32)))
    bb_g = jax.jit(lambda p, x: sum(jnp.sum(g.astype(jnp.float32))
                                    for g in jax.tree_util.tree_leaves(_bb_g(p, x))))
    _log(f"backbone+head fwd+bwd: {timeit(bb_g, variables['params'], imgs)*1000:.1f} ms")

    # --- full model ---
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                           rngs={"dropout": jax.random.PRNGKey(2)},
                                           mutable=["batch_stats"])[0][0]["loss"])
    _log(f"full fwd: {timeit(fwd, variables, imgs)*1000:.1f} ms")

    _grad = jax.grad(lambda p, x: model.apply(
        {"params": p, "batch_stats": variables["batch_stats"]}, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])[0][0]["loss"])
    grad = jax.jit(lambda p, x: sum(jnp.sum(g.astype(jnp.float32))
                                    for g in jax.tree_util.tree_leaves(_grad(p, x))))
    _log(f"full fwd+bwd: {timeit(grad, variables['params'], imgs)*1000:.1f} ms")

    # --- the real train step (grad + Adam + state threading), timed on an
    # evolving state chain exactly like bench.py ---
    from rcf_tpu.config import Config
    from rcf_tpu.train import create_train_state, make_train_step

    tcfg = Config({"optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 1e-6,
                   "epochs": 8, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
                   "model_kwargs": {}})
    state = create_train_state(tcfg, model, variables, steps_per_epoch=100)
    step = make_train_step(model, donate=False)
    oc = jnp.zeros((), jnp.int32)

    batch = {"imgs": imgs}

    def chain(n, s):
        t0 = time.perf_counter()
        for k in range(n):
            s, losses = step(s, batch, jax.random.PRNGKey(100 + k), oc)
        np.asarray(losses["loss"])
        return time.perf_counter() - t0

    s, losses = step(state, batch, jax.random.PRNGKey(0), oc)
    np.asarray(losses["loss"])
    t3, t13 = chain(3, state), chain(13, state)
    _log(f"train step (marginal chain): {(t13 - t3) / 10 * 1000:.1f} ms")


if __name__ == "__main__":
    main()
