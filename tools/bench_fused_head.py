"""Microbench: fused resize_concat conv0 — splice cost attribution.

Times decode_head2's conv0 fwd+bwd at bench shapes in three variants:
  a. direct resize-then-conv (the reference-shaped path)
  b. fused conv-at-source + exact border splice (the shipped path)
  c. fused WITHOUT the splice (inexact; lower bound on the splice cost)

Usage: python tools/bench_fused_head.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rcf_tpu.ops import resize_bilinear
from rcf_tpu.ops import fused_resize_conv as frc


def _log(m):
    print(f"[fusedhead] {m}", file=sys.stderr, flush=True)


def _sync(out):
    # A host copy is the only reliable sync through the axon relay
    # (block_until_ready returns early there).
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def chain(call, n=20):
    _sync(call())
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = call()
    _sync(o)
    return (time.perf_counter() - t0) / n


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = jnp.bfloat16
    n, f = 16, 256
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((n, 96, 96, 256)), dtype)   # stage-1 feats
    x4 = jnp.asarray(rng.standard_normal((n, 48, 48, 2048)), dtype)  # stage-4 feats
    k1 = jnp.asarray(rng.standard_normal((3, 3, 256, f)) * 0.01, dtype)
    k4 = jnp.asarray(rng.standard_normal((3, 3, 2048, f)) * 0.01, dtype)
    d = 6

    def direct(x1, x4, k1, k4):
        up = resize_bilinear(x4, (96, 96), False).astype(dtype)
        return frc.same_conv(x1, k1, d) + frc.same_conv(up, k4, d)

    def fused(x1, x4, k1, k4):
        return frc.same_conv(x1, k1, d) + frc.fused_resize_conv(x4, k4, (96, 96), d, False)

    def fused_nosplice(x1, x4, k1, k4):
        lo = frc.same_conv(x4, k4, d // 2)
        return frc.same_conv(x1, k1, d) + resize_bilinear(lo, (96, 96), False).astype(dtype)

    import rcf_tpu.ops.fused_resize_conv as frcmod

    def make_partial(which):
        def part(x1, x4, k1, k4):
            # monkeypatch-free: recompute with selective splice via flags
            return frc.same_conv(x1, k1, d) + _fused_selective(x4, k4, which)
        return part

    def _fused_selective(x, kernel, which):
        """Copy of fused_resize_conv with branches gated for attribution."""
        h = w = 48
        ht = wt = 96
        n = x.shape[0]
        k = 3
        rows = frcmod._wrong_lines(h, ht, d, False, k)
        cols = frcmod._wrong_lines(w, wt, d, False, k)
        f = kernel.shape[-1]
        dl = d // 2
        pad = (k - 1) // 2 * dl
        from jax import lax as _lax
        lo = _lax.conv_general_dilated(
            x, kernel, (1, 1), ((pad, pad), (pad, pad)),
            rhs_dilation=(dl, dl), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        main = frc.resize_bilinear(lo, (ht, wt), False).astype(lo.dtype)
        a_h = jnp.asarray(frcmod._tap_gather_matrix(h, ht, d, False, k, rows), x.dtype)
        a_w = jnp.asarray(frcmod._tap_gather_matrix(w, wt, d, False, k, cols), x.dtype)
        if "r" in which:
            taps = jnp.einsum("rh,nhwc->nrwc", a_h, x).reshape(n * len(rows), k, w, -1)
            ex = _lax.conv_general_dilated(
                taps, kernel, (1, 1), ((0, 0), (pad, pad)),
                rhs_dilation=(1, dl), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(n, len(rows), w, f)
            rw = jnp.asarray(frcmod._linear_matrix(w, wt, False), ex.dtype)
            ex = jnp.einsum("Ww,nrwf->nrWf", rw, ex)
            main = main.at[:, jnp.asarray(rows)].set(ex)
        if "c" in which:
            taps = (jnp.einsum("cw,nhwk->nhck", a_w, x)
                    .reshape(n, h, len(cols), k, -1).transpose(0, 2, 1, 3, 4)
                    .reshape(n * len(cols), h, k, -1))
            ex = _lax.conv_general_dilated(
                taps, kernel, (1, 1), ((pad, pad), (0, 0)),
                rhs_dilation=(dl, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(n, len(cols), h, f)
            rh = jnp.asarray(frcmod._linear_matrix(h, ht, False), ex.dtype)
            ex = jnp.einsum("Hh,nchf->nHcf", rh, ex)
            main = main.at[:, :, jnp.asarray(cols)].set(ex)
        if "x" in which:
            corner_taps = jnp.einsum("rh,cw,nhwk->nrck", a_h, a_w, x).reshape(
                n, len(rows), k, len(cols), k, -1)
            corners = jnp.einsum("naibjc,ijcf->nabf", corner_taps, kernel)
            main = main.at[:, jnp.asarray(rows)[:, None], jnp.asarray(cols)[None, :]].set(corners)
        return main

    for name, fn in (("a_direct", direct), ("b_fused_splice", fused),
                     ("c_fused_nosplice", fused_nosplice),
                     ("d_rows_only", make_partial("r")),
                     ("e_cols_only", make_partial("c")),
                     ("f_corners_only", make_partial("x"))):
        def loss(x1, x4, k1, k4):
            return jnp.sum(fn(x1, x4, k1, k4).astype(jnp.float32) ** 2)

        # Every timed program returns ONE scalar: syncing via host copy
        # must not drag activation-sized tensors through the relay.
        def gsum(x1, x4, k1, k4):
            gs = jax.grad(loss, argnums=(2, 3))(x1, x4, k1, k4)
            return sum(jnp.sum(g.astype(jnp.float32)) for g in gs)

        g = jax.jit(gsum)
        fw = jax.jit(loss)
        t_f = chain(lambda: fw(x1, x4, k1, k4))
        t_g = chain(lambda: g(x1, x4, k1, k4))
        _log(f"{name}: fwd {t_f*1e3:.2f} ms, fwd+grad(kernels) {t_g*1e3:.2f} ms")


if __name__ == "__main__":
    main()
