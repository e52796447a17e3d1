"""Split the AMD unflow-loss cost: warps vs SSIM vs occlusion vs L1.

tools/profile_amd.py measures the composed unflow_loss at 137.9 ms fwd+bwd
(round 2) — the largest single block of the AMD step. This script times
ablated variants of the SAME jitted shape (d/flows gradients, like the
step) so the deltas attribute the inside:

  full          L1 + SSIM + occlusion (the shipped _FLOW_CFG)
  no-ssim       w_ssim=0 (isolates SSIM fwd+bwd incl. its 5 pools/level)
  no-l1         w_l1=0
  l1-only+bidir occ_from_back=False (no splat; bidirectional range check)

Each variant still consumes all 4 weighted levels and both directions.
"""
from __future__ import annotations

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _log(m):
    print(f"[unflow] {m}", file=sys.stderr, flush=True)


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

    from rcf_tpu.losses.unflow import unflow_loss
    from rcf_tpu.models.amd.amd_model import _FLOW_CFG

    rng = np.random.default_rng(0)
    b = 8
    im1 = jnp.asarray(rng.random((b, 384, 640, 3)).astype(np.float32)).astype(jnp.bfloat16)
    im2 = jnp.asarray(rng.random((b, 384, 640, 3)).astype(np.float32)).astype(jnp.bfloat16)
    pyr = [jnp.asarray((rng.standard_normal((b, 384 // s, 640 // s, 4)) * 3).astype(np.float32))
           for s in (1, 2, 4, 8, 16)]

    variants = {
        "full": _FLOW_CFG,
        "no-ssim": replace(_FLOW_CFG, w_ssim=0.0),
        "no-l1": replace(_FLOW_CFG, w_l1=0.0),
        "l1-only": replace(_FLOW_CFG, w_ssim=0.0),
        "bidir-occ": replace(_FLOW_CFG, occ_from_back=False),
    }
    for name, cfg in variants.items():
        g = jax.grad(lambda p, a, c, _cfg=cfg: unflow_loss(p, a, c, _cfg)[0].astype(jnp.float32))
        jg = jax.jit(lambda p, a, c, _g=g: sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(_g(p, a, c))))
        _log(f"{name}: fwd+bwd {timeit(jg, pyr, im1, im2)*1000:.1f} ms")


if __name__ == "__main__":
    main()
