import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.models import build_model


def _model_kwargs(c=4, mask_size=(16, 16), separate_residual=True, **over):
    kw = {
        "w_seg": 1.0,
        "w_entropy": 0.05,
        "separate_residual": separate_residual,
        "mask_layer": c,
        "align_corners": False,
        "mask_size": list(mask_size),
        "backbone2": {
            "type": "ResNet", "depth": 50, "num_stages": 4,
            "out_indices": [0, 1, 2, 3], "strides": [1, 2, 1, 1],
            "dilations": [1, 1, 2, 4], "contract_dilation": True,
            "norm_cfg": {"type": "SyncBN", "requires_grad": True},
            "norm_eval": False, "style": "pytorch",
        },
        "decode_head": {
            "type": "FlowAggregationHeadWithResidual", "mask_layer": c,
            "flow_feat_before_agg_kernel_size": 3, "num_flow_feat_channels": 64,
            "mask_size": list(mask_size), "norm_flow": False, "clamp_flow_t": 20.0,
            "free_residual": True, "allow_residual_resize": True,
            "residual_adjustment_scale": 10.0, "pred_div_coeff": 10.0,
            "create_flownet": True, "ssim_sz": 1,
        },
        "decode_head2": {
            "type": "FCNHead", "input_transform": "resize_concat",
            "in_channels": [256, 2048], "in_index": [0, 3], "channels": 64,
            "num_convs": 2, "dilation": 6, "dropout_ratio": 0.1,
            "num_classes": c, "concat_input": False, "align_corners": False,
        },
        "decode_head3": {
            "type": "FCNHead", "in_channels": 4096, "in_index": -1,
            "channels": 64, "num_convs": 2, "dilation": 6, "dropout_ratio": 0.1,
            "num_classes": 4 * c if separate_residual else 2 * c,
            "concat_input": False, "align_corners": False,
        },
    }
    kw.update(over)
    return kw


def _batch(rng, b=2, i=2, hw=64):
    return (
        jnp.asarray(rng.standard_normal((b, i, hw, hw, 3), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((b, i - 1, hw, hw, 2), dtype=np.float32) * 5),
        jnp.asarray(rng.standard_normal((b, i - 1, hw, hw, 2), dtype=np.float32) * 5),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model(_model_kwargs())
    rng = np.random.default_rng(0)
    imgs, fw, bw = _batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        imgs, fw, bw, train=True,
    )
    return model, variables


def test_forward_train_losses_and_probs(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    imgs, fw, bw = _batch(rng)
    (losses, probs), _ = model.apply(
        variables, imgs, fw, bw, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert set(losses) >= {"loss", "loss_warp_seg", "loss_entropy"}
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert probs.shape == (2, 2, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow  # see tests/README.md time budget
def test_gradients_flow(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(2)
    imgs, fw, bw = _batch(rng)

    def loss_fn(params):
        (losses, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, fw, bw, train=True,
            rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
        )
        return losses["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    # The backbone must receive gradient through the mask path.
    g_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["backbone2"]))
    assert g_norm > 0


def test_joint_residual_variant():
    model = build_model(_model_kwargs(separate_residual=False))
    rng = np.random.default_rng(3)
    imgs, fw, bw = _batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, imgs, fw, bw, train=True
    )
    (losses, probs), _ = model.apply(
        variables, imgs, fw, bw, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert np.isfinite(float(losses["loss"]))


def test_eval_mask_probs(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.standard_normal((2, 72, 88, 3), dtype=np.float32))
    probs = model.apply(variables, imgs, train=False, method=model.mask_probs)
    assert probs.shape == (2, 18, 22, 4)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_resnet_feature_shapes():
    from rcf_tpu.nn import ResNet

    net = ResNet(depth=50, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                 contract_dilation=True, out_indices=(0, 1, 2, 3))
    x = jnp.zeros((1, 96, 96, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    feats = net.apply(variables, x, train=False)
    assert [f.shape for f in feats] == [
        (1, 24, 24, 256), (1, 12, 12, 512), (1, 12, 12, 1024), (1, 12, 12, 2048)
    ]
