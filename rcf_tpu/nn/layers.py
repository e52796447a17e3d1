"""Shared Flax building blocks (NHWC, mixed-precision aware).

Cross-replica BatchNorm: the reference trains with SyncBN over GPUs
(`configs/rcf/rcf_stage1.yaml` norm_cfg). Here the train step is a single
global-view `jit` over a `Mesh('data')`, so `nn.BatchNorm`'s batch reduction
is *already* a global reduction — XLA inserts the cross-chip collective.
SyncBN therefore needs no special casing (no `axis_name` plumbing) unless
running under shard_map/pmap.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm2d defaults: momentum 0.1 (=> flax momentum 0.9), eps 1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class ConvModule(nn.Module):
    """conv -> BN -> activation, the mmcv ConvModule contract."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_norm: bool = True
    act: Callable | None = nn.relu
    use_bias: bool | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        use_bias = (not self.use_norm) if self.use_bias is None else self.use_bias
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            padding=pad,
            kernel_dilation=self.dilation,
            use_bias=use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x
