"""PWC-Lite with per-mask constant flow groups (the AMD flownet).

Parity with `models/amd/pwc_lite.py`: a 6-level conv feature pyramid,
coarse-to-fine loop over the top 5 levels with flow upsampling (x2,
align_corners=True), backward warping, a 9x9 cost volume, a dense-connected
flow estimator, and — the AMD twist — per-mask *constant* flows: the
estimator features are mask-average-pooled, pushed through the same 1x1
prediction head, broadcast constant over space, accumulated across levels
(`pwc_lite.py:85-107,161-233`), and composited through the masks.

Returns, per direction: the per-level piecewise-constant flows (finest
first, 4x upsampled), the unconstrained flows, and the final sum groups.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize_bilinear
from ...ops.warp import correlation, flow_warp


def _conv(features, kernel_size=3, stride=1, dilation=1, dtype=None, name=None):
    pad = ((kernel_size - 1) * dilation) // 2
    return nn.Conv(features, (kernel_size, kernel_size), strides=stride,
                   kernel_dilation=dilation, padding=pad, use_bias=True,
                   dtype=dtype,
                   kernel_init=nn.initializers.kaiming_normal(), name=name)


class FeatureExtractor(nn.Module):
    num_chs: tuple = (3, 16, 32, 64, 96, 128, 192)
    dtype: Any = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        pyramid = []
        for level, ch in enumerate(self.num_chs[1:]):
            x = nn.leaky_relu(_conv(ch, stride=2, dtype=self.dtype,
                                    name=f"l{level}_conv0")(x), 0.1)
            x = nn.leaky_relu(_conv(ch, dtype=self.dtype,
                                    name=f"l{level}_conv1")(x), 0.1)
            pyramid.append(x)
        return pyramid[::-1]  # coarsest first


class FlowEstimatorReduce(nn.Module):
    mask_layer: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask):
        """x [B,h,w,Cin]; mask [B,h,w,M] -> (feat, flow groups, direct flow).

        Convs run in the compute dtype; flow VALUES (the two prediction
        heads' outputs) and the mask-pooled moments are f32 — flow
        magnitudes up to the clamp (~tens of px) need more than bf16's
        8-bit mantissa once accumulated across pyramid levels.
        """
        dt = self.dtype
        x1 = nn.leaky_relu(_conv(128, dtype=dt, name="conv1")(x), 0.1)
        x2 = nn.leaky_relu(_conv(128, dtype=dt, name="conv2")(x1), 0.1)
        x3 = nn.leaky_relu(_conv(96, dtype=dt, name="conv3")(jnp.concatenate([x1, x2], -1)), 0.1)
        x4 = nn.leaky_relu(_conv(64, dtype=dt, name="conv4")(jnp.concatenate([x2, x3], -1)), 0.1)
        x5 = nn.leaky_relu(_conv(32, dtype=dt, name="conv5")(jnp.concatenate([x3, x4], -1)), 0.1)
        feat = jnp.concatenate([x4, x5], -1)

        predict1 = _conv(64, kernel_size=1, dtype=dt, name="predict_flow1")
        predict2 = _conv(2, kernel_size=1, dtype=dt, name="predict_flow2")

        def head(f):
            return predict2(nn.leaky_relu(predict1(f), 0.1)).astype(jnp.float32)

        flow_direct = head(feat)

        # Mask-average-pooled features -> constant flow per mask channel.
        # The h*w-long reduction accumulates in f32 (preferred_element_type)
        # regardless of the feature dtype.
        b, h, w, c = feat.shape
        mflat = mask.reshape(b, h * w, self.mask_layer)
        pooled = jnp.einsum("bpc,bpm->bmc", feat.reshape(b, h * w, c),
                            mflat.astype(feat.dtype),
                            preferred_element_type=jnp.float32)
        pooled = pooled / jnp.sum(mflat, axis=1, dtype=jnp.float32)[..., None]
        # Broadcast constant over space, run the same 1x1 head: [B, M, 2].
        const = head(pooled.astype(feat.dtype)[:, :, None, :])[:, :, 0, :]
        # flow_group[m] constant maps [B, h, w, 2].
        flow_group = [jnp.broadcast_to(const[:, m, None, None, :], (b, h, w, 2))
                      for m in range(self.mask_layer)]
        return x5, flow_group, flow_direct


class PWCLite(nn.Module):
    mask_layer: int
    search_range: int = 4
    output_level: int = 4  # loop over 5 of the 6 pyramid levels
    dtype: Any = None  # compute dtype for convs/correlation; flows stay f32

    @nn.compact
    def __call__(self, img1, img2, mask1, mask2, with_bk: bool = True):
        """imgs [B, H, W, 3] in [0, 1]; masks [B, Hm, Wm, M]."""
        extractor = FeatureExtractor(dtype=self.dtype, name="pyramid")
        estimator = FlowEstimatorReduce(self.mask_layer, dtype=self.dtype,
                                        name="estimator")
        conv1x1 = [_conv(32, kernel_size=1, dtype=self.dtype,
                         name=f"conv_1x1_{i}") for i in range(5)]

        p1 = extractor(img1)
        p2 = extractor(img2)

        def one_direction(x1_pyr, x2_pyr, mask):
            b, h0, w0, _ = x1_pyr[0].shape
            flow = jnp.zeros((b, h0, w0, 2))
            flow_all = jnp.zeros((b, h0, w0, 2))
            sum_group = [jnp.zeros((b, h0, w0, 2)) for _ in range(self.mask_layer)]
            flows, flows_all = [], []
            for level, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
                if level >= 1:
                    hw = x1.shape[1:3]
                    flow = resize_bilinear(flow * 2, hw, align_corners=True)
                    flow_all = resize_bilinear(flow_all * 2, hw, align_corners=True)
                    sum_group = [resize_bilinear(g * 2, hw, align_corners=True) for g in sum_group]
                x2_warp = x2 if level == 0 else flow_warp(x2, flow)
                corr = nn.leaky_relu(correlation(x1, x2_warp, self.search_range), 0.1)
                x1_1by1 = nn.leaky_relu(conv1x1[level](x1), 0.1)
                mask_resize = resize_bilinear(mask, x1.shape[1:3], align_corners=True)
                inputs = jnp.concatenate(
                    [corr, x1_1by1, flow.astype(x1_1by1.dtype)], axis=-1)
                _, flow_group, flow_all_res = estimator(inputs, mask_resize)
                sum_group = [g + fg for g, fg in zip(sum_group, flow_group)]
                flow = sum(mask_resize[..., m : m + 1] * sum_group[m]
                           for m in range(self.mask_layer))
                flow_all = flow_all + flow_all_res
                flows.append(flow)
                flows_all.append(flow_all)
                if level == self.output_level:
                    break

            def up4(f):
                hw = (f.shape[1] * 4, f.shape[2] * 4)
                return resize_bilinear(f * 4, hw, align_corners=True)

            return ([up4(f) for f in flows][::-1], [up4(f) for f in flows_all][::-1],
                    [up4(g) for g in sum_group])

        out = {}
        out["flows_fw"], out["flows_fw_all"], out["flows_fw_group"] = one_direction(p1, p2, mask2)
        if with_bk:
            out["flows_bw"], out["flows_bw_all"], out["flows_bw_group"] = one_direction(p2, p1, mask1)
        return out
