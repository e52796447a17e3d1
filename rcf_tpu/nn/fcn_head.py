"""FCN decode head (NHWC Flax).

Parity with the reference `models/fcn_head.py:38-147,211-218` +
`models/decode_head.py:141-170`:

* input transforms: ``resize_concat`` (upsample the selected features to the
  first one's resolution, concat on channels), ``multiple_select``, or a
  single integer index;
* ``num_convs`` dilated 3x3 ConvModules (BN+ReLU), optional ``concat_input``
  fusion conv, channel dropout (Dropout2d), and a 1x1 ``conv_seg`` classifier
  initialized N(0, 0.01) (`models/decode_head.py:137-139`).

Used twice by RCF: the mask head (resize_concat of stage-1 + stage-4
features) and the residual head (last feature map of both frames).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import resize_bilinear
from .layers import ConvModule


class FCNHead(nn.Module):
    num_classes: int
    channels: int = 256
    num_convs: int = 2
    kernel_size: int = 3
    dilation: int = 1
    input_dilation: int | None = None
    input_stride: int = 1
    concat_input: bool = True
    dropout_ratio: float = 0.1
    in_index: Any = -1
    input_transform: str | None = None
    align_corners: bool = False
    in_channels: Any = None  # config parity; Flax infers input channels
    norm_cfg: Any = None  # config parity (SyncBN is implicit in global-view jit)
    dtype: jnp.dtype = jnp.float32

    def _transform_inputs(self, inputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        if self.input_transform == "resize_concat":
            picked = [inputs[i] for i in self.in_index]
            target_hw = picked[0].shape[-3:-1]
            upsampled = [
                resize_bilinear(x, target_hw, align_corners=self.align_corners) for x in picked
            ]
            return jnp.concatenate(upsampled, axis=-1)
        if self.input_transform == "multiple_select":
            return [inputs[i] for i in self.in_index]
        return inputs[self.in_index]

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = True) -> jnp.ndarray:
        x = self._transform_inputs(inputs)
        input_dilation = self.dilation if self.input_dilation is None else self.input_dilation
        out = ConvModule(
            self.channels, self.kernel_size, stride=self.input_stride,
            dilation=input_dilation, dtype=self.dtype, name="conv0",
        )(x, train)
        for i in range(self.num_convs - 1):
            out = ConvModule(
                self.channels, self.kernel_size, dilation=self.dilation,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(out, train)
        if self.concat_input:
            out = ConvModule(
                self.channels, self.kernel_size, dilation=self.dilation,
                dtype=self.dtype, name="conv_cat",
            )(jnp.concatenate([x, out], axis=-1), train)
        if self.dropout_ratio > 0:
            # Dropout2d: drop whole channels (broadcast over H, W).
            out = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                             deterministic=not train)(out)
        return nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype, name="conv_seg",
            kernel_init=nn.initializers.normal(0.01),
        )(out)
