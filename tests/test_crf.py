import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.ops.crf import (
    CRFParams,
    crf_soft_single,
    make_crf_fn,
    mask_to_unary,
    unnormalize_to_uint8,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _numpy_crf(rgb_u8, mask, params: CRFParams):
    """Direct dense NxN mean field mirroring the CUDA semantics exactly."""
    h, w = mask.shape
    n = h * w
    u8 = np.clip(mask * 255.0 / params.crf_scale, 0, 255).astype(np.uint8).astype(np.float64)
    u = u8 / (u8.max() + 1e-8)
    u = np.clip(u, 1e-6, 1 - 1e-6)
    unary = np.stack([-np.log(1 - u), -np.log(u)], -1).reshape(n, 2)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    feat = np.concatenate(
        [xs.reshape(-1, 1) / params.sxy, ys.reshape(-1, 1) / params.sxy,
         rgb_u8.reshape(-1, 3).astype(np.float64) / params.srgb], -1)
    d2 = ((feat[:, None, :] - feat[None, :, :]) ** 2).sum(-1)
    k = np.exp(-d2 / 2)
    k = k / k.sum(-1, keepdims=True)  # normalized filter (slice divides by weight)
    q = np.exp(-unary)
    q = q / q.sum(-1, keepdims=True)
    for _ in range(params.refine_iters):
        msg = params.scomp * (k @ q)
        e = -unary + msg
        e = e - e.max(-1, keepdims=True)
        q = np.exp(e)
        q = q / q.sum(-1, keepdims=True)
    return (q[:, 1] > q[:, 0]).astype(np.float32).reshape(h, w)


def test_crf_matches_dense_numpy_reference():
    rng = np.random.default_rng(0)
    h, w = 12, 10
    rgb = rng.integers(0, 255, (h, w, 3), np.uint8)
    mask = rng.random((h, w)).astype(np.float32)
    params = CRFParams(refine_iters=10)
    ours = np.asarray(crf_soft_single(jnp.asarray(rgb), jnp.asarray(mask), params, chunk=32))
    ref = _numpy_crf(rgb, mask, params)
    assert (ours == ref).mean() > 0.99


def test_crf_snaps_noisy_mask_to_color_region():
    """Left half red / right half blue; noisy mask roughly on the red half
    must be cleaned into exactly the red half."""
    rng = np.random.default_rng(1)
    h, w = 32, 32
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2, 0] = 200
    rgb[:, w // 2:, 2] = 200
    mask = np.zeros((h, w), np.float32)
    mask[:, : w // 2] = 0.7
    mask += rng.normal(0, 0.25, (h, w)).astype(np.float32)
    mask = np.clip(mask, 0, 1)
    params = CRFParams(refine_iters=20)
    out = np.asarray(crf_soft_single(jnp.asarray(rgb), jnp.asarray(mask), params, chunk=128))
    assert out[:, : w // 2].mean() > 0.95
    assert out[:, w // 2:].mean() < 0.05


def test_mask_to_unary_quantization_parity():
    mask = jnp.asarray([[0.0, 0.35, 0.7, 1.0]])
    unary = np.asarray(mask_to_unary(mask, crf_scale=0.7))
    # f32 math (as in torch): 0.35*255/0.7 = 127.49999 -> trunc 127;
    # 0.7*255/0.7 = 254.99997 -> trunc 254; 1.0 clips to 255.
    u8 = np.array([0, 127, 254, 255], np.float64)
    u = np.clip(u8 / (u8.max() + 1e-8), 1e-6, 1 - 1e-6)
    # rtol 1e-3: f32 rounding at the 1-1e-6 clip boundary (torch f32 matches).
    np.testing.assert_allclose(unary[0, :, 1], -np.log(u), rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(unary[0, :, 0], -np.log(1 - u), rtol=1e-3, atol=1e-7)


def test_make_crf_fn_batched_and_downscaled():
    rng = np.random.default_rng(2)
    h, w = 24, 20
    raw = rng.integers(0, 255, (2, h, w, 3)).astype(np.float32) / 255.0
    imgs = (raw - IMAGENET_MEAN) / IMAGENET_STD
    masks = rng.random((2, h, w)).astype(np.float32)
    out_full = make_crf_fn(refine_iters=3, chunk=64)(jnp.asarray(imgs), jnp.asarray(masks))
    assert out_full.shape == (2, h, w)
    out_half = make_crf_fn(resolution=(12, 10), refine_iters=3, chunk=64)(
        jnp.asarray(imgs), jnp.asarray(masks))
    assert out_half.shape == (2, h, w)
    assert np.isfinite(np.asarray(out_half)).all()


def test_unnormalize_roundtrip():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 255, (1, 8, 8, 3)).astype(np.float32)
    imgs = (raw / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    back = np.asarray(unnormalize_to_uint8(jnp.asarray(imgs)))
    np.testing.assert_allclose(back[0].astype(np.float32), raw[0], atol=1.0)


def test_stable_exit_matches_fixed_iterations():
    """MAP-stability early-out (CRFParams.stable_exit): same MAP as the
    fixed-count reference loop (torchcrf.cu:140 runs a fixed 50), in fewer
    iterations, on structured content where the mean field converges."""
    rng = np.random.default_rng(4)
    h, w = 32, 32
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2, 0] = 200
    rgb[:, w // 2:, 2] = 200
    mask = np.clip(np.where(np.arange(w)[None, :] < w // 2, 0.7, 0.0)
                   + rng.normal(0, 0.25, (h, w)), 0, 1).astype(np.float32)
    fixed = np.asarray(crf_soft_single(
        jnp.asarray(rgb), jnp.asarray(mask), CRFParams(refine_iters=50), chunk=128))
    early, iters = crf_soft_single(
        jnp.asarray(rgb), jnp.asarray(mask),
        CRFParams(refine_iters=50, stable_exit=True), chunk=128, return_iters=True)
    assert (np.asarray(early) == fixed).all()
    assert int(iters) < 50


def test_stable_exit_under_vmap_freezes_converged_images():
    """vmap over the while_loop: each image keeps its own early-exit MAP even
    when another image in the batch needs more iterations."""
    rng = np.random.default_rng(5)
    h, w = 16, 16
    rgbs = rng.integers(0, 255, (3, h, w, 3), np.uint8)
    rgbs[0, :, : w // 2] = [200, 0, 0]
    rgbs[0, :, w // 2:] = [0, 0, 200]
    masks = rng.random((3, h, w)).astype(np.float32)
    params = CRFParams(refine_iters=25, stable_exit=True)

    batched = jax.vmap(
        lambda im, mk: crf_soft_single(im, mk, params, chunk=64)
    )(jnp.asarray(rgbs), jnp.asarray(masks))
    singles = [np.asarray(crf_soft_single(jnp.asarray(rgbs[i]), jnp.asarray(masks[i]),
                                          params, chunk=64)) for i in range(3)]
    for i in range(3):
        assert (np.asarray(batched[i]) == singles[i]).all(), f"image {i}"


def test_stable_exit_safe_under_grad_with_stop_gradient():
    """The in-training target path wraps the CRF input in stop_gradient; the
    data-dependent while_loop must not break jax.grad of the surrounding
    loss (train/step.py builds exactly this shape)."""
    rng = np.random.default_rng(6)
    h, w = 12, 12
    rgb = jnp.asarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    params = CRFParams(refine_iters=10, stable_exit=True)

    def loss(theta):
        mask = jax.nn.sigmoid(theta)
        target = crf_soft_single(rgb, jax.lax.stop_gradient(mask), params, chunk=64)
        return jnp.mean((mask - target) ** 2)

    g = jax.grad(loss)(jnp.asarray(rng.normal(0, 1, (h, w)), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
