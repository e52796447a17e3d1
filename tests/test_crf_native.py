"""Native permutohedral CRF: build, run, and cross-validate against the
exact attention-based engine (two independent implementations of the same
mean field; the lattice is an approximation of the exact Gaussian filter,
so agreement is expected to be high but not bitwise)."""

import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.ops.crf import CRFParams, crf_soft_single

gxx = shutil.which("g++")
pytestmark = pytest.mark.skipif(gxx is None, reason="g++ not available")


@pytest.fixture(scope="module")
def native():
    from rcf_tpu.ops import crf_native

    if not crf_native.available():
        pytest.skip("native CRF failed to build")
    return crf_native


def _two_color_scene(rng, h=48, w=48):
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2, 0] = 200
    rgb[:, w // 2:, 2] = 200
    rgb = np.clip(rgb.astype(int) + rng.integers(-10, 10, rgb.shape), 0, 255).astype(np.uint8)
    mask = np.clip(
        np.where(np.arange(w)[None, :] < w // 2, 0.7, 0.0)
        + rng.normal(0, 0.2, (h, w)), 0, 1
    ).astype(np.float32)
    return rgb, mask


def test_native_crf_cleans_mask(native):
    rng = np.random.default_rng(0)
    rgb, mask = _two_color_scene(rng)
    out = native.crf_soft_native(rgb, mask, refine_iters=20)
    assert out.shape == mask.shape
    assert set(np.unique(out)) <= {0.0, 1.0}
    assert out[:, : 20].mean() > 0.9
    assert out[:, 28:].mean() < 0.1


def test_native_agrees_with_attention_engine(native):
    rng = np.random.default_rng(1)
    rgb, mask = _two_color_scene(rng)
    params = CRFParams(refine_iters=20)
    exact = np.asarray(crf_soft_single(jnp.asarray(rgb), jnp.asarray(mask), params, chunk=256))
    lattice = native.crf_soft_native(rgb, mask, refine_iters=20)
    agreement = (exact == lattice).mean()
    assert agreement > 0.97, f"lattice vs exact agreement only {agreement:.3f}"


def test_semantic_constraints_crf_pass_engines_agree(native):
    """The pseudo-label factory's _crf_pass must give the same refinement
    under either engine (it defaults to the native lattice via auto)."""
    from rcf_tpu.grouping.semantic_constraints import _crf_pass, _resolve_crf_engine

    assert _resolve_crf_engine("auto") == "native"
    rng = np.random.default_rng(2)
    rgb, mask = _two_color_scene(rng)
    params = CRFParams(refine_iters=20, crf_scale=0.7)
    out_native = _crf_pass(rgb, mask, params, chunk=256, engine="native")
    out_attn = _crf_pass(rgb, mask, params, chunk=256, engine="attention")
    assert out_native.shape == mask.shape
    agreement = (out_native == out_attn).mean()
    assert agreement > 0.97, f"sc engines agree only {agreement:.3f}"
