"""mmseg-flavoured ResNet backbone in Flax (NHWC).

Capability parity with the reference `models/resnet.py` for everything the
RCF/AMD configs exercise: depths 18/34/50/101/152, per-stage strides and
dilations, ``contract_dilation`` (first block of a dilated stage halves its
dilation, `models/res_layer.py:66-70`), multi-feature ``out_indices``,
'pytorch' style (stride on the 3x3 conv of the bottleneck,
`models/resnet.py:150-157`), optional deep stem / avg-down downsampling
(V1c/V1d variants), frozen stages, and norm-eval mode.

RCF config: depth 50, strides [1, 2, 1, 1], dilations [1, 1, 2, 4],
contract_dilation → output stride 4 for stage 1 and 8 for stages 2-4.

TPU notes: NHWC layout; convolutions in ``dtype`` (bf16-capable) with fp32
parameters and fp32 BN statistics. BatchNorm under global-view jit is
cross-replica by construction (see `layers.py`).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM

_STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
_BASIC_DEPTHS = (18, 34)


class _BasicBlock(nn.Module):
    planes: int
    stride: int
    dilation: int
    has_downsample: bool
    avg_down: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                                epsilon=BN_EPS, dtype=self.dtype, name=name)

        def conv(feats, k, stride, dilation, name):
            pad = (k - 1) // 2 * dilation
            return nn.Conv(feats, (k, k), strides=stride, padding=pad, kernel_dilation=dilation,
                           use_bias=False, dtype=self.dtype, name=name,
                           kernel_init=nn.initializers.he_normal())

        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 3, self.stride, self.dilation, "conv1")(x)))
        out = bn("bn2")(conv(self.planes, 3, 1, self.dilation, "conv2")(out))
        if self.has_downsample:
            if self.avg_down and self.stride != 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
                identity = conv(self.planes, 1, 1, 1, "ds_conv")(identity)
            else:
                identity = conv(self.planes, 1, self.stride, 1, "ds_conv")(identity)
            identity = bn("ds_bn")(identity)
        return nn.relu(out + identity)


class _Bottleneck(nn.Module):
    planes: int
    stride: int
    dilation: int
    has_downsample: bool
    avg_down: bool
    dtype: jnp.dtype
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                                epsilon=BN_EPS, dtype=self.dtype, name=name)

        def conv(feats, k, stride, dilation, name):
            pad = (k - 1) // 2 * dilation
            return nn.Conv(feats, (k, k), strides=stride, padding=pad, kernel_dilation=dilation,
                           use_bias=False, dtype=self.dtype, name=name,
                           kernel_init=nn.initializers.he_normal())

        identity = x
        # 'pytorch' style: stride lives on the 3x3 conv.
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, self.dilation, "conv2")(out)))
        out = bn("bn3")(conv(self.planes * self.expansion, 1, 1, 1, "conv3")(out))
        if self.has_downsample:
            if self.avg_down and self.stride != 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
                identity = conv(self.planes * self.expansion, 1, 1, 1, "ds_conv")(identity)
            else:
                identity = conv(self.planes * self.expansion, 1, self.stride, 1, "ds_conv")(identity)
            identity = bn("ds_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    contract_dilation: bool = False
    deep_stem: bool = False
    avg_down: bool = False
    stem_channels: int = 64
    base_channels: int = 64
    frozen_stages: int = -1  # handled by the optimizer mask, kept for config parity
    norm_eval: bool = False
    style: str = "pytorch"
    norm_cfg: dict | None = None  # accepted for config parity (SyncBN is implicit)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.norm_eval:
            train = False
        block_cls = _BasicBlock if self.depth in _BASIC_DEPTHS else _Bottleneck
        expansion = 1 if self.depth in _BASIC_DEPTHS else 4
        blocks_per_stage = _STAGE_BLOCKS[self.depth][: self.num_stages]

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                                epsilon=BN_EPS, dtype=self.dtype, name=name)

        # Stem: 7x7/2 (or three 3x3 for deep_stem), then 3x3/2 max-pool.
        if self.deep_stem:
            for i, feats in enumerate((self.stem_channels // 2, self.stem_channels // 2, self.stem_channels)):
                x = nn.Conv(feats, (3, 3), strides=2 if i == 0 else 1, padding=1, use_bias=False,
                            dtype=self.dtype, name=f"stem_conv{i + 1}",
                            kernel_init=nn.initializers.he_normal())(x)
                x = nn.relu(bn(f"stem_bn{i + 1}")(x))
        else:
            x = nn.Conv(self.stem_channels, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1",
                        kernel_init=nn.initializers.he_normal())(x)
            x = nn.relu(bn("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        in_channels = self.stem_channels
        for stage, num_blocks in enumerate(blocks_per_stage):
            planes = self.base_channels * 2**stage
            stride, dilation = self.strides[stage], self.dilations[stage]
            for blk in range(num_blocks):
                if blk == 0:
                    blk_dilation = dilation // 2 if (dilation > 1 and self.contract_dilation) else dilation
                    has_ds = stride != 1 or in_channels != planes * expansion
                    x = block_cls(planes, stride, blk_dilation, has_ds, self.avg_down,
                                  self.dtype, name=f"layer{stage + 1}_{blk}")(x, train)
                    in_channels = planes * expansion
                else:
                    x = block_cls(planes, 1, dilation, False, self.avg_down,
                                  self.dtype, name=f"layer{stage + 1}_{blk}")(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
