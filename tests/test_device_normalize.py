"""Device-side normalization (`tpu.device_normalize`): uint8 batches through
the model must match the host-normalized float path exactly."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rcf_tpu.config import Config
from rcf_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, TrainTransform
from rcf_tpu.models import build_model
from tests.test_train_step import _tiny_model_kwargs


def test_uint8_forward_matches_float_forward():
    rng = np.random.default_rng(0)
    model = build_model(_tiny_model_kwargs())
    u8 = rng.integers(0, 255, (2, 2, 32, 32, 3)).astype(np.uint8)
    flows = jnp.asarray((rng.standard_normal((2, 1, 32, 32, 2)) * 5).astype(np.float32))
    f32 = ((u8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(f32), flows, flows, train=True,
    )

    def fwd(imgs):
        (losses, probs), _ = model.apply(
            variables, imgs, flows, flows, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        return float(losses["loss"]), np.asarray(probs)

    loss_f, probs_f = fwd(jnp.asarray(f32))
    loss_u, probs_u = fwd(jnp.asarray(u8))
    assert loss_u == np.float32(loss_f) or abs(loss_u - loss_f) < 1e-5
    np.testing.assert_allclose(probs_u, probs_f, atol=1e-5)


def test_transform_keep_uint8(davis_like):
    from rcf_tpu.data import VideoDataset

    ds = VideoDataset(str(davis_like), "trainval.txt", training=True, frame_num=2,
                      load_flow=True, flow_suffix="_T")
    tf = TrainTransform(strong_aug=True, keep_uint8=True)
    out = tf(ds[0], np.random.default_rng(0))
    assert out["imgs"].dtype == np.uint8
    assert out["imgs"].shape == (2, 384, 384, 3)
    assert out["gt_fw_flows"].dtype == np.float32


@pytest.mark.slow  # see tests/README.md time budget
def test_loop_runs_with_device_normalize(davis_like, tmp_path):
    from tests.test_loop_e2e import _cfg
    from rcf_tpu.train.loop import run

    cfg = _cfg(davis_like, tmp_path / "ckpt")
    cfg.epochs = 1
    tree = cfg.to_dict()
    tree["tpu"] = {"mesh_shape": [-1], "mesh_axes": ["data"], "device_normalize": True}
    result = run(Config(tree), test_only=False, no_test=False)
    assert np.isfinite(result.miou_frame_avg)
