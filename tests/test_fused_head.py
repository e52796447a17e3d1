"""Fused resize_concat conv0 (`ops/fused_resize_conv.py`) equals the direct
resize->concat->conv path exactly (borders included), and the FCNHead fast
path preserves outputs, grads, and the parameter tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.nn.fcn_head import FCNHead
from rcf_tpu.ops import resize_bilinear
from rcf_tpu.ops.fused_resize_conv import fused_resize_conv, same_conv


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("hw,target,dilation", [
    ((8, 8), (16, 16), 6),    # the RCF head geometry (scale 2, dil 6)
    ((8, 8), (32, 32), 4),    # scale 4
    ((8, 12), (16, 24), 2),   # non-square
])
def test_fused_matches_direct_op(hw, target, dilation):
    x = _rand(0, (2, *hw, 5))
    k = _rand(1, (3, 3, 5, 7))
    direct = same_conv(resize_bilinear(x, target, False), k, dilation)
    fused = fused_resize_conv(x, k, target, dilation, False)
    assert fused is not None
    np.testing.assert_allclose(np.asarray(fused), np.asarray(direct), atol=2e-5, rtol=1e-5)


def test_fused_grads_match_direct_op():
    x = _rand(2, (1, 8, 8, 4))
    k = _rand(3, (3, 3, 4, 6))

    def loss(fn, x, k):
        return jnp.sum(jnp.sin(fn(x, k)))

    gd = jax.grad(loss, argnums=(1, 2))(
        lambda x, k: same_conv(resize_bilinear(x, (16, 16), False), k, 6), x, k)
    gf = jax.grad(loss, argnums=(1, 2))(
        lambda x, k: fused_resize_conv(x, k, (16, 16), 6, False), x, k)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("ineligible", [
    ((8, 8), (16, 16), 3, False),   # dilation % scale != 0
    ((8, 8), (12, 12), 6, False),   # non-integer scale
    ((8, 8), (16, 16), 6, True),    # align_corners: dense mismatch set
])
def test_ineligible_returns_none(ineligible):
    hw, target, dilation, ac = ineligible
    x = _rand(4, (1, *hw, 3))
    k = _rand(5, (3, 3, 3, 2))
    assert fused_resize_conv(x, k, target, dilation, ac) is None


def _head(fast, ac=False, concat_input=False):
    return FCNHead(
        num_classes=4, channels=8, num_convs=2, dilation=6,
        input_transform="resize_concat", in_index=[0, 1],
        concat_input=concat_input, align_corners=ac, dropout_ratio=0.0,
        fast_resize_concat=fast,
    )


@pytest.mark.parametrize("ac", [False, True])
def test_fcn_head_fast_path_equivalence(ac):
    feats = [_rand(6, (2, 16, 16, 4)), _rand(7, (2, 8, 8, 6))]
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    fast, slow = _head(True, ac), _head(False, ac)
    vf = fast.init(rngs, feats, train=True)
    vs = slow.init(rngs, feats, train=True)
    # identical parameter trees (paths AND values: same init RNG fold)
    assert jax.tree.structure(vf) == jax.tree.structure(vs)
    for a, b in zip(jax.tree.leaves(vf), jax.tree.leaves(vs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    of, _ = fast.apply(vf, feats, train=True, mutable=["batch_stats"])
    os_, _ = slow.apply(vs, feats, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(of), np.asarray(os_), atol=3e-5, rtol=1e-4)


def test_fcn_head_concat_input_uses_direct_path():
    feats = [_rand(8, (1, 16, 16, 4)), _rand(9, (1, 8, 8, 6))]
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    fast, slow = _head(True, concat_input=True), _head(False, concat_input=True)
    vf = fast.init(rngs, feats, train=True)
    of, _ = fast.apply(vf, feats, train=True, mutable=["batch_stats"])
    os_, _ = slow.apply(vf, feats, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(of), np.asarray(os_))
