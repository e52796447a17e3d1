"""Torch->Flax importer parity: a minimal torch replica of the reference's
mmseg-style modules is built in-test, randomly initialized, imported, and
compared against our Flax forward numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from rcf_tpu.nn import FCNHead, ResNet  # noqa: E402
from rcf_tpu.train.checkpoint import import_fcn_head, import_flow_head, import_resnet  # noqa: E402


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride, dilation, downsample):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idn)


class TorchResNet50(tnn.Module):
    """mmseg ResNet-50, pytorch style, strides [1,2,1,1], dilations [1,1,2,4],
    contract_dilation=True (the RCF backbone config)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        cfg = [(64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 1, 2), (512, 3, 1, 4)]
        inplanes = 64
        for li, (planes, blocks, stride, dilation) in enumerate(cfg, start=1):
            layers = []
            for b in range(blocks):
                if b == 0:
                    ds = None
                    if stride != 1 or inplanes != planes * 4:
                        ds = tnn.Sequential(
                            tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                            tnn.BatchNorm2d(planes * 4),
                        )
                    first_dil = dilation // 2 if dilation > 1 else dilation
                    layers.append(TorchBottleneck(inplanes, planes, stride, first_dil, ds))
                    inplanes = planes * 4
                else:
                    layers.append(TorchBottleneck(inplanes, planes, 1, dilation, None))
            setattr(self, f"layer{li}", tnn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
            outs.append(x)
        return outs


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(rng.standard_normal(m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(rng.random(m.running_var.shape).astype(np.float32) + 0.5))
            m.weight.data.copy_(torch.from_numpy(rng.standard_normal(m.weight.shape).astype(np.float32) * 0.1 + 1))
            m.bias.data.copy_(torch.from_numpy(rng.standard_normal(m.bias.shape).astype(np.float32) * 0.1))


def test_resnet50_import_forward_parity():
    rng = np.random.default_rng(0)
    tm = TorchResNet50().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    sd = tm.state_dict()

    net = ResNet(depth=50, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                 contract_dilation=True, out_indices=(0, 1, 2, 3))
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, stats = import_resnet(sd, depth=50)
    chex_tree = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
    imported_tree = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert chex_tree == imported_tree

    ours = net.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(
            np.asarray(o), t.permute(0, 2, 3, 1).numpy(), atol=2e-3, rtol=1e-3
        )


def test_fcn_head_import_forward_parity():
    rng = np.random.default_rng(1)

    class TorchFCN(tnn.Module):
        def __init__(self, in_ch=48, ch=16, classes=4, dilation=6):
            super().__init__()
            def cm(ic, oc):
                # mmcv ConvModule names its children .conv / .bn / .activate.
                m = tnn.Module()
                m.conv = tnn.Conv2d(ic, oc, 3, padding=dilation, dilation=dilation, bias=False)
                m.bn = tnn.BatchNorm2d(oc)
                m.forward = lambda x, m=m: torch.relu(m.bn(m.conv(x)))
                return m
            self.convs = tnn.Sequential(cm(in_ch, ch), cm(ch, ch))
            self.conv_seg = tnn.Conv2d(ch, classes, 1)

        def forward(self, x):
            return self.conv_seg(self.convs(x))

    tm = TorchFCN().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    params, stats = import_fcn_head(tm.state_dict(), prefix="", num_convs=2, concat_input=False)

    head = FCNHead(num_classes=4, channels=16, num_convs=2, dilation=6,
                   dropout_ratio=0.0, concat_input=False, in_index=0)
    x = rng.standard_normal((2, 12, 12, 48)).astype(np.float32)
    variables = head.init({"params": jax.random.PRNGKey(0)}, [jnp.asarray(x)], train=False)
    assert jax.tree_util.tree_map(lambda a: a.shape, variables["params"]) == \
        jax.tree_util.tree_map(lambda a: a.shape, params)
    ours = head.apply({"params": params, "batch_stats": stats}, [jnp.asarray(x)], train=False)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4, rtol=1e-4)


def test_flow_head_conv1d_import():
    rng = np.random.default_rng(2)
    sd = {
        "flow_feat_before_agg.0.weight": torch.from_numpy(rng.standard_normal((16, 2, 3, 3)).astype(np.float32)),
        "flow_feat_before_agg.0.bias": torch.from_numpy(rng.standard_normal(16).astype(np.float32)),
        "flow_feat_before_agg.2.weight": torch.from_numpy(rng.standard_normal((16, 16, 3, 3)).astype(np.float32)),
        "flow_feat_before_agg.2.bias": torch.from_numpy(rng.standard_normal(16).astype(np.float32)),
        "flow_feat_after_agg.0.weight": torch.from_numpy(rng.standard_normal((16, 16, 1)).astype(np.float32)),
        "flow_feat_after_agg.0.bias": torch.from_numpy(rng.standard_normal(16).astype(np.float32)),
        "flow_feat_after_agg.2.weight": torch.from_numpy(rng.standard_normal((2, 16, 1)).astype(np.float32)),
        "flow_feat_after_agg.2.bias": torch.from_numpy(rng.standard_normal(2).astype(np.float32)),
    }
    params = import_flow_head(sd, prefix="")
    # Dense kernel must be the conv1d weight transposed.
    w = sd["flow_feat_after_agg.0.weight"].numpy()[:, :, 0]
    np.testing.assert_array_equal(params["flow_agg_fc0"]["kernel"], w.T)
    assert params["flow_feat_conv0"]["kernel"].shape == (3, 3, 2, 16)
