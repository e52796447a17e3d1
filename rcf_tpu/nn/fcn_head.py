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
from ..ops.fused_resize_conv import fused_resize_conv, same_conv
from .layers import BN_EPS, BN_MOMENTUM, ConvModule


class _Kernel(nn.Module):
    """Bare conv-kernel holder so the fused path keeps nn.Conv's param path
    (``conv0/Conv_0/kernel``) — checkpoints/importers see an identical tree."""

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.he_normal(), self.shape)


class _FusedResizeConcatConv(nn.Module):
    """conv0 of a resize_concat head without materializing the upsampled
    concat: per-source kernel slices, conv-at-source-resolution + exact
    border splice for integer-scale inputs (`ops/fused_resize_conv.py`),
    then the usual BN+ReLU. Same math and same param/stat layout as
    ``ConvModule`` over ``concat(upsampled)``, ~3x fewer conv FLOPs on the
    RCF head (reference `models/decode_head.py:141-170` semantics)."""

    features: int
    kernel_size: int
    dilation: int
    align_corners: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, picked: Sequence[jnp.ndarray], train: bool = True) -> jnp.ndarray:
        k = self.kernel_size
        in_ch = sum(p.shape[-1] for p in picked)
        kernel = _Kernel((k, k, in_ch, self.features), name="Conv_0")()
        target_hw = tuple(picked[0].shape[-3:-1])
        out = None
        off = 0
        for p in picked:
            ch = p.shape[-1]
            ksl = kernel[:, :, off : off + ch, :].astype(self.dtype)
            off += ch
            xp = p.astype(self.dtype)
            if tuple(p.shape[-3:-1]) == target_hw:
                y = same_conv(xp, ksl, self.dilation)
            else:
                y = fused_resize_conv(xp, ksl, target_hw, self.dilation, self.align_corners)
                if y is None:  # non-integer scale etc: resize-then-conv
                    y = same_conv(
                        resize_bilinear(xp, target_hw, self.align_corners).astype(self.dtype),
                        ksl, self.dilation,
                    )
            out = y if out is None else out + y
        out = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="BatchNorm_0",
        )(out)
        return nn.relu(out)


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
    fast_resize_concat: bool = True  # exact fused conv0 (ops/fused_resize_conv.py)
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
        x = inputs[self.in_index]
        if isinstance(x, (list, tuple)):  # deferred channel concat (see _picked)
            x = jnp.concatenate(list(x), axis=-1)
        return x

    def _picked(self, inputs: Sequence[jnp.ndarray]) -> list[jnp.ndarray] | None:
        """Input slices for the fused split conv0, or None when the direct
        path must run. A list/tuple *element* of ``inputs`` is a deferred
        channel concat (the caller avoids materializing the interleave;
        `models/rcf.py` residual regroup)."""
        if self.input_transform == "resize_concat":
            return [inputs[i] for i in self.in_index]
        if self.input_transform == "multiple_select":
            return None
        x = inputs[self.in_index]
        return list(x) if isinstance(x, (list, tuple)) else None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = True) -> jnp.ndarray:
        input_dilation = self.dilation if self.input_dilation is None else self.input_dilation
        picked = self._picked(inputs) if (
            self.fast_resize_concat
            and not self.concat_input  # conv_cat would need the concat anyway
            and self.input_stride == 1
        ) else None
        if picked is not None:
            x = None
            out = _FusedResizeConcatConv(
                self.channels, self.kernel_size, input_dilation,
                self.align_corners, self.dtype, name="conv0",
            )(picked, train)
        else:
            x = self._transform_inputs(inputs)
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
