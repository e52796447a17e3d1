import numpy as np
import pytest

from rcf_tpu.ops import resize_bilinear, resize_nearest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((96, 96), (48, 48)), ((48, 48), (96, 96)), ((480, 854), (96, 96)),
     ((97, 175), (392, 697)), ((7, 9), (13, 5))],
)
def test_bilinear_matches_torch(in_hw, out_hw, align_corners):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(x, out_hw, align_corners=align_corners))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw, mode="bilinear", align_corners=align_corners,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    # Tolerance: our separable-matmul formulation accumulates over the full
    # input axis (mostly zeros); f32 rounding differs from torch's 2-tap path.
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("in_hw,out_hw", [((10, 14), (5, 7)), ((5, 7), (11, 13)), ((480, 854), (96, 96))])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, size=(1, *in_hw, 2)).astype(np.float32)
    ours = np.asarray(resize_nearest(x, out_hw))
    theirs = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


def test_identity_short_circuit():
    x = np.ones((1, 8, 8, 1), np.float32)
    assert resize_bilinear(x, (8, 8)) is x
    assert resize_nearest(x, (8, 8)) is x


def test_leading_batch_dims():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 16, 16, 4), dtype=np.float32)
    y = resize_bilinear(x, (8, 8))
    assert y.shape == (2, 3, 8, 8, 4)
    flat = resize_bilinear(x.reshape(6, 16, 16, 4), (8, 8))
    np.testing.assert_allclose(np.asarray(y).reshape(6, 8, 8, 4), np.asarray(flat), atol=1e-6)
