"""Full reference-Lightning-checkpoint import: every RCF submodule +
EMA trees, round-tripped into an initialized Flax model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rcf_tpu.models import build_model  # noqa: E402
from rcf_tpu.train.checkpoint import load_pretrained  # noqa: E402
from tests.test_train_step import _tiny_model_kwargs  # noqa: E402


def _resnet18_sd(prefix, rng):
    """Torch-style ResNet-18 state dict with random values."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{prefix}{name}.weight"] = torch.from_numpy(
            rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05)

    def bn(name, c):
        sd[f"{prefix}{name}.weight"] = torch.ones(c)
        sd[f"{prefix}{name}.bias"] = torch.zeros(c)
        sd[f"{prefix}{name}.running_mean"] = torch.from_numpy(rng.standard_normal(c).astype(np.float32))
        sd[f"{prefix}{name}.running_var"] = torch.ones(c)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 128, 256, 512]
    inp = 64
    for stage, c in enumerate(chans, start=1):
        for blk in range(2):
            base = f"layer{stage}.{blk}"
            conv(f"{base}.conv1", c, inp if blk == 0 else c, 3)
            bn(f"{base}.bn1", c)
            conv(f"{base}.conv2", c, c, 3)
            bn(f"{base}.bn2", c)
            if blk == 0 and inp != c:
                conv(f"{base}.downsample.0", c, inp, 1)
                bn(f"{base}.downsample.1", c)
        inp = c
    return sd


def _fcn_sd(prefix, in_ch, ch, classes, rng):
    sd = {}
    sd[f"{prefix}convs.0.conv.weight"] = torch.from_numpy(
        rng.standard_normal((ch, in_ch, 3, 3)).astype(np.float32) * 0.05)
    for part in ("convs.0.bn", "convs.1.bn"):
        sd[f"{prefix}{part}.weight"] = torch.ones(ch)
        sd[f"{prefix}{part}.bias"] = torch.zeros(ch)
        sd[f"{prefix}{part}.running_mean"] = torch.zeros(ch)
        sd[f"{prefix}{part}.running_var"] = torch.ones(ch)
    sd[f"{prefix}convs.1.conv.weight"] = torch.from_numpy(
        rng.standard_normal((ch, ch, 3, 3)).astype(np.float32) * 0.05)
    sd[f"{prefix}conv_seg.weight"] = torch.from_numpy(
        rng.standard_normal((classes, ch, 1, 1)).astype(np.float32) * 0.05)
    sd[f"{prefix}conv_seg.bias"] = torch.zeros(classes)
    return sd


def _flow_sd(prefix, nf, rng):
    sd = {}
    sd[f"{prefix}flow_feat_before_agg.0.weight"] = torch.from_numpy(
        rng.standard_normal((nf, 2, 3, 3)).astype(np.float32))
    sd[f"{prefix}flow_feat_before_agg.0.bias"] = torch.zeros(nf)
    sd[f"{prefix}flow_feat_before_agg.2.weight"] = torch.from_numpy(
        rng.standard_normal((nf, nf, 3, 3)).astype(np.float32))
    sd[f"{prefix}flow_feat_before_agg.2.bias"] = torch.zeros(nf)
    sd[f"{prefix}flow_feat_after_agg.0.weight"] = torch.from_numpy(
        rng.standard_normal((nf, nf, 1)).astype(np.float32))
    sd[f"{prefix}flow_feat_after_agg.0.bias"] = torch.zeros(nf)
    sd[f"{prefix}flow_feat_after_agg.2.weight"] = torch.from_numpy(
        rng.standard_normal((2, nf, 1)).astype(np.float32))
    sd[f"{prefix}flow_feat_after_agg.2.bias"] = torch.zeros(2)
    return sd


def test_lightning_checkpoint_full_import(tmp_path):
    rng = np.random.default_rng(0)
    c = 4
    sd = {}
    sd.update(_resnet18_sd("model.backbone2.", rng))
    sd.update(_resnet18_sd("model.backbone2_ema.", rng))
    # decode_head2 in_ch: resize_concat of stage-1 (64) + stage-4 (512) = 576.
    sd.update(_fcn_sd("model.decode_head2.", 576, 16, c, rng))
    sd.update(_fcn_sd("model.decode_head2_ema.", 576, 16, c, rng))
    sd.update(_fcn_sd("model.decode_head3.", 2 * 512, 16, 4 * c, rng))
    sd.update(_flow_sd("model.decode_head.", 16, rng))
    ckpt_path = tmp_path / "last.ckpt"
    torch.save({"state_dict": sd}, ckpt_path)

    mk = _tiny_model_kwargs(c=c, ema=True)
    model = build_model(mk)
    imgs = jnp.zeros((1, 2, 32, 32, 3))
    flows = jnp.zeros((1, 1, 32, 32, 2))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        imgs, flows, flows, train=True,
    )
    loaded = load_pretrained(str(ckpt_path), model, dict(variables))

    # Backbone conv imported (HWIO transpose of the torch OIHW weight).
    w_torch = sd["model.backbone2.conv1.weight"].numpy()
    np.testing.assert_array_equal(
        loaded["params"]["backbone2"]["conv1"]["kernel"], np.transpose(w_torch, (2, 3, 1, 0)))
    # Flow head dense kernel = conv1d transposed.
    np.testing.assert_array_equal(
        loaded["params"]["flow_head"]["flow_agg_fc0"]["kernel"],
        sd["model.decode_head.flow_feat_after_agg.0.weight"].numpy()[:, :, 0].T)
    # EMA trees imported separately and differ from the main weights.
    assert "ema_params" in loaded
    ema_conv1 = loaded["ema_params"]["backbone2"]["conv1"]["kernel"]
    np.testing.assert_array_equal(
        ema_conv1, np.transpose(sd["model.backbone2_ema.conv1.weight"].numpy(), (2, 3, 1, 0)))
    assert not np.array_equal(ema_conv1, loaded["params"]["backbone2"]["conv1"]["kernel"])
    # BN running stats landed in batch_stats.
    np.testing.assert_array_equal(
        loaded["batch_stats"]["backbone2"]["bn1"]["mean"],
        sd["model.backbone2.bn1.running_mean"].numpy())
    # The imported model still runs a forward pass.
    (losses, probs), _ = model.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
        imgs, flows, flows, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert np.isfinite(float(losses["loss"]))


def test_glob_and_backbone_only(tmp_path):
    rng = np.random.default_rng(1)
    sd = _resnet18_sd("", rng)
    torch.save(sd, tmp_path / "densecl_ep200.pth")
    mk = _tiny_model_kwargs(c=4, ema=False)
    model = build_model(mk)
    imgs = jnp.zeros((1, 2, 32, 32, 3))
    flows = jnp.zeros((1, 1, 32, 32, 2))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        imgs, flows, flows, train=True,
    )
    loaded = load_pretrained(str(tmp_path / "densecl_*.pth"), model, dict(variables))
    np.testing.assert_array_equal(
        loaded["params"]["backbone2"]["conv1"]["kernel"],
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)))
