"""Pallas TPU kernel: flash-style normalized bilateral filtering.

The hot op of mean-field dense CRF (ops/crf.py) is

    num_i = sum_j exp(f_i . f_j - |f_i|^2/2 - |f_j|^2/2) * v_j
    den_i = sum_j exp(...)

i.e. unnormalized attention with 5-d features. Because every logit is
<= 0, no online max-rescaling is needed (unlike flash attention): the
kernel streams key tiles through VMEM, forms logits on the MXU, applies
exp on the VPU, and accumulates (num, den) in f32 — never materializing
the [N, N] weight matrix in HBM (the XLA fallback materializes
[chunk, N] logits per map step).

Feature augmentation packs the norm terms into one matmul:
    qf = [f, 1, -|f|^2/2, 0]   kf = [f, -|f|^2/2, 1, 0]
    qf . kf = f.f - |f_k|^2/2 - |f_q|^2/2
Padded keys carry -BIG in their norm slot so their weight is exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _kernel(qf_ref, kf_ref, v_ref, out_ref, *, tk: int):
    n = kf_ref.shape[0]
    tq = qf_ref.shape[0]

    def body(t, carry):
        num, den = carry
        k = kf_ref[pl.ds(t * tk, tk), :]                      # [TK, 8]
        v = v_ref[pl.ds(t * tk, tk), :]                       # [TK, 1]
        logits = jax.lax.dot_general(
            qf_ref[:], k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [TQ, TK]
        w = jnp.exp(logits)
        num = num + jnp.dot(w, v, preferred_element_type=jnp.float32)
        den = den + jnp.sum(w, axis=-1, keepdims=True)
        return num, den

    num0 = jnp.zeros((tq, 1), jnp.float32)
    den0 = jnp.zeros((tq, 1), jnp.float32)
    num, den = jax.lax.fori_loop(0, n // tk, body, (num0, den0))
    out_ref[:] = jnp.concatenate([num, den], axis=-1)


def _augment(feat: jnp.ndarray, n_pad: int):
    """feat [N, D] -> (qf [Np, 8], kf [Np, 8]) with norm terms packed in."""
    n, d = feat.shape
    assert d <= 5
    sq = jnp.sum(feat * feat, axis=-1, keepdims=True) * 0.5
    zeros = jnp.zeros((n, 1), feat.dtype)
    pad_f = jnp.zeros((n, 5 - d), feat.dtype)
    ones = jnp.ones((n, 1), feat.dtype)
    qf = jnp.concatenate([feat, pad_f, ones, -sq, zeros], axis=-1)
    kf = jnp.concatenate([feat, pad_f, -sq, ones, zeros], axis=-1)
    extra = n_pad - n
    if extra:
        qf = jnp.pad(qf, ((0, extra), (0, 0)))
        kf_pad = jnp.zeros((extra, 8), feat.dtype).at[:, 5].set(-_BIG)
        kf = jnp.concatenate([kf, kf_pad], axis=0)
    return qf, kf


@functools.partial(jax.jit, static_argnames=("tq", "tk"))
def bilateral_numden_pallas(feat: jnp.ndarray, values: jnp.ndarray,
                            tq: int = 512, tk: int = 2048):
    """feat [N, D<=5]; values [N, 1] -> (num [N, 1], den [N, 1])."""
    n = feat.shape[0]
    n_pad = -(-n // max(tq, tk)) * max(tq, tk)
    qf, kf = _augment(feat.astype(jnp.float32), n_pad)
    v = jnp.pad(values.astype(jnp.float32), ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, tk=tk),
        grid=(n_pad // tq,),
        in_specs=[
            pl.BlockSpec((tq, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * 8 + 4 * n_pad * n_pad,
            bytes_accessed=n_pad * 8 * 4 * 2 + n_pad * 2 * 4,
            transcendentals=n_pad * n_pad,
        ),
    )(qf, kf, v)
    return out[:n, :1], out[:n, 1:2]


def normalized_filter_pallas(feat: jnp.ndarray, prob1: jnp.ndarray,
                             tq: int = 512, tk: int = 2048) -> jnp.ndarray:
    """Binary-CRF message: normalized filter of the fg probability.

    feat [N, D]; prob1 [N] -> filtered fg prob [N] (bg = 1 - fg since the
    normalized filter preserves the simplex).
    """
    num, den = bilateral_numden_pallas(feat, prob1[:, None], tq, tk)
    return (num / den)[:, 0]
