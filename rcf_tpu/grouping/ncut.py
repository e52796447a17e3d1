"""Soft normalized-cut over DINO feature affinities (pure jnp).

Parity with the reference
(`tools/SemanticConstraintsAndMAA/maa.py:19-36` /
`semantic_constraints.py:21-75`):

* affinity ``A = (f̂ f̂ᵀ) > tau ? 1 : eps`` over L2-normalized patch key
  features (CLS dropped);
* ``NCut(x) = cut(x, 1-x)/assoc(x) + cut(x, 1-x)/assoc(1-x)`` with the
  soft mask ``x`` flattened at the feature grid;
* gradient-based refinement: the mask itself is the parameter; 10 Adam
  steps (lr 0.45, torch-style additive weight decay 1e-6) on the NCut
  value, clamping to [0, 1] after every step.

On TPU the whole refinement is one compiled `lax.scan` over the Adam
steps, batched over frames — the reference runs a Python optimizer loop
per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def build_affinity(feats: jnp.ndarray, tau: float = 0.2, eps: float = 1e-5) -> jnp.ndarray:
    """feats [N+1, D] (token 0 = CLS, dropped) -> [N, N] thresholded affinity."""
    f = feats[1:]
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True).clip(1e-12)
    a = (f @ f.T) > tau
    return jnp.where(a, 1.0, eps)


def soft_ncut_value(feats: jnp.ndarray, mask: jnp.ndarray, tau: float = 0.2,
                    eps: float = 1e-5) -> jnp.ndarray:
    """feats [N+1, D]; mask [h, w] (or [N]) soft in [0,1] -> scalar NCut."""
    a = build_affinity(feats, tau, eps)
    return _ncut_from_affinity(a, mask)


def _ncut_from_affinity(a: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    x = mask.reshape(-1).astype(jnp.float32)
    ax = a @ x
    cut_ab = (1.0 - x) @ ax
    assoc_av = jnp.sum(ax)
    assoc_bv = jnp.sum(a @ (1.0 - x))
    return cut_ab / assoc_av + cut_ab / assoc_bv


def ncut_refine(feats: jnp.ndarray, mask: jnp.ndarray, tau: float = 0.2, eps: float = 1e-5,
                steps: int = 10, learning_rate: float = 0.45,
                weight_decay: float = 1e-6) -> jnp.ndarray:
    """Gradient-refine a soft mask [h, w] against the NCut objective."""
    a = build_affinity(feats, tau, eps)
    # torch.optim.Adam(weight_decay) = L2 term added to the gradient.
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale(-learning_rate),
    )

    def step(carry, _):
        m, opt_state = carry
        grad = jax.grad(lambda mm: _ncut_from_affinity(a, mm))(m)
        updates, opt_state = tx.update(grad, opt_state, m)
        m = jnp.clip(m + updates, 0.0, 1.0)
        return (m, opt_state), None

    init = (mask.astype(jnp.float32), tx.init(mask.astype(jnp.float32)))
    (refined, _), _ = jax.lax.scan(step, init, None, length=steps)
    return refined
