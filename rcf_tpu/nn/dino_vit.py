"""DINO Vision Transformer (ViT-S/8 and friends) in Flax.

Parity with the reference `models/dino_vit.py` (timm/DINO-style ViT):
patch-embed conv, CLS token, bicubically interpolated position embeddings
(with the +0.1 anti-rounding offset, `dino_vit.py:216-236`), pre-norm
blocks, and a ``get_last_k`` entry point that returns the key features of
the final attention layer — the reference extracts these with a forward
hook on ``blocks[-1].attn.qkv`` (`tools/SemanticConstraintsAndMAA/
maa.py:69-74,97-121`); here they are a first-class output.

The bicubic interpolation matrix uses torch's a=-0.75 kernel so imported
checkpoints reproduce the reference's positional encodings exactly
(jax.image uses a=-0.5).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@functools.lru_cache(maxsize=64)
def _cubic_matrix(in_size: int, scale: float) -> np.ndarray:
    """[out, in] torch-style bicubic (a=-0.75) interpolation matrix with
    ``scale_factor`` semantics: out = floor(in * scale)."""
    a = -0.75
    out_size = int(math.floor(in_size * scale))
    out = np.arange(out_size, dtype=np.float64)
    src = (out + 0.5) / scale - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    mat = np.zeros((out_size, in_size), np.float32)

    def w(t):
        t = np.abs(t)
        return np.where(
            t <= 1, (a + 2) * t**3 - (a + 3) * t**2 + 1,
            np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
        )

    for k in range(-1, 3):
        idx = np.clip(lo + k, 0, in_size - 1)
        mat[np.arange(out_size), idx] += w(frac - k).astype(np.float32)
    return mat


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    def _qkv(self, x):
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        b, n, _ = qkv.shape
        hd = self.dim // self.num_heads
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], qkv

    @nn.compact
    def __call__(self, x, return_k: bool = False):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        q, k, v, qkv_raw = self._qkv(y)
        if return_k:
            b, n = k.shape[:2]
            return k.reshape(b, n, self.dim)
        hd = self.dim // self.num_heads
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd**-0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(x.shape)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        x = x + out
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class DinoViT(nn.Module):
    patch_size: int = 8
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    train_grid: int = 28  # pos-embed grid the checkpoint was trained at (224/8)
    dtype: jnp.dtype = jnp.float32

    def _interp_pos_embed(self, pos_embed, h0: int, w0: int):
        n = self.train_grid
        if (h0, w0) == (n, n):
            return pos_embed
        cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
        grid = patch_pe.reshape(1, n, n, self.embed_dim)
        # DINO's +0.1 offset then scale-factor bicubic (dino_vit.py:224-233).
        mh = jnp.asarray(_cubic_matrix(n, (h0 + 0.1) / n))
        mw = jnp.asarray(_cubic_matrix(n, (w0 + 0.1) / n))
        grid = jnp.einsum("oh,bhwc->bowc", mh, grid)
        grid = jnp.einsum("pw,bowc->bopc", mw, grid)
        assert grid.shape[1:3] == (h0, w0)
        return jnp.concatenate([cls_pe, grid.reshape(1, h0 * w0, self.embed_dim)], axis=1)

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, return_last_k: bool = False):
        """imgs: [B, H, W, 3] (ImageNet-normalized). Returns normed tokens
        [B, N+1, D], or the last block's key features when return_last_k."""
        b, h, w, _ = imgs.shape
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=p, padding=0, dtype=self.dtype,
                    name="patch_embed")(imgs)
        h0, w0 = x.shape[1], x.shape[2]
        x = x.reshape(b, h0 * w0, self.embed_dim)
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.train_grid * self.train_grid + 1, self.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)), x], axis=1)
        x = x + self._interp_pos_embed(pos_embed, h0, w0)

        for i in range(self.depth):
            last = i == self.depth - 1
            blk = _Block(self.embed_dim, self.num_heads, self.mlp_ratio, self.dtype,
                         name=f"block{i}")
            if last and return_last_k:
                return blk(x, return_k=True)
            x = blk(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


def vit_small(patch_size: int = 8, **kwargs) -> DinoViT:
    return DinoViT(patch_size=patch_size, embed_dim=384, depth=12, num_heads=6, **kwargs)


def vit_base(patch_size: int = 8, **kwargs) -> DinoViT:
    return DinoViT(patch_size=patch_size, embed_dim=768, depth=12, num_heads=12, **kwargs)


def import_dino_torch(sd: dict, depth: int = 12) -> dict:
    """DINO torch checkpoint -> DinoViT params tree."""

    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    params = {
        "cls_token": t(sd["cls_token"]),
        "pos_embed": t(sd["pos_embed"]),
        "patch_embed": {
            "kernel": np.transpose(t(sd["patch_embed.proj.weight"]), (2, 3, 1, 0)),
            "bias": t(sd["patch_embed.proj.bias"]),
        },
        "norm": {"scale": t(sd["norm.weight"]), "bias": t(sd["norm.bias"])},
    }
    for i in range(depth):
        pb = f"blocks.{i}."
        params[f"block{i}"] = {
            "norm1": {"scale": t(sd[pb + "norm1.weight"]), "bias": t(sd[pb + "norm1.bias"])},
            "norm2": {"scale": t(sd[pb + "norm2.weight"]), "bias": t(sd[pb + "norm2.bias"])},
            "qkv": {"kernel": t(sd[pb + "attn.qkv.weight"]).T, "bias": t(sd[pb + "attn.qkv.bias"])},
            "proj": {"kernel": t(sd[pb + "attn.proj.weight"]).T, "bias": t(sd[pb + "attn.proj.bias"])},
            "fc1": {"kernel": t(sd[pb + "mlp.fc1.weight"]).T, "bias": t(sd[pb + "mlp.fc1.bias"])},
            "fc2": {"kernel": t(sd[pb + "mlp.fc2.weight"]).T, "bias": t(sd[pb + "mlp.fc2.bias"])},
        }
    return params


def moco_vit_small(patch_size: int = 16, **kwargs) -> DinoViT:
    # Reference quirk kept: MoCo-v3 ViT-S uses 12 heads at embed 384
    # (`models/dino_vit.py:300-305`), unlike DINO ViT-S's 6.
    return DinoViT(patch_size=patch_size, embed_dim=384, depth=12, num_heads=12, **kwargs)


def moco_vit_base(patch_size: int = 16, **kwargs) -> DinoViT:
    return DinoViT(patch_size=patch_size, embed_dim=768, depth=12, num_heads=12, **kwargs)


def mae_vit_base(patch_size: int = 16, **kwargs) -> DinoViT:
    return DinoViT(patch_size=patch_size, embed_dim=768, depth=12, num_heads=12, **kwargs)


def import_moco_v3_torch(ckpt: dict, depth: int = 12) -> dict:
    """MoCo-v3 checkpoint -> params: keep module.base_encoder.* (minus the
    head), strip the prefix (`models/dino_vit.py:487-496`)."""
    sd = ckpt.get("state_dict", ckpt)
    prefix = "module.base_encoder."
    stripped = {
        k[len(prefix):]: v for k, v in sd.items()
        if k.startswith(prefix) and not k.startswith(prefix + "head")
    }
    return import_dino_torch(stripped, depth=depth)


def import_mae_torch(ckpt: dict, depth: int = 12) -> dict:
    """MAE checkpoint -> params: ckpt['model'] minus decoder_*/mask_token
    keys (`models/dino_vit.py:497-506`)."""
    sd = ckpt.get("model", ckpt)
    kept = {k: v for k, v in sd.items()
            if not (k.startswith("decoder") or k.startswith("mask_token"))}
    return import_dino_torch(kept, depth=depth)


_DINO_ARCHS = {
    "vit_small": (vit_small, import_dino_torch),
    "vit_base": (vit_base, import_dino_torch),
    "moco_vit_small": (moco_vit_small, import_moco_v3_torch),
    "moco_vit_base": (moco_vit_base, import_moco_v3_torch),
    "mae_vit_base": (mae_vit_base, import_mae_torch),
}


def get_dino_model(arch: str, patch_size: int, checkpoint_path: str | None = None):
    """Resolve arch + checkpoint into (module, params) — the counterpart of
    the reference's `get_dino_model` (`models/dino_vit.py:448-520`), with a
    local checkpoint path instead of a download URL (no egress here; set
    DINO_CHECKPOINT or pass the path from config).

    Returns (DinoViT module, params dict or None). params is None when no
    checkpoint is given (random weights, with a warning — reference
    behavior for unknown arch/patch combos).
    """
    if arch not in _DINO_ARCHS:
        raise NotImplementedError(f"unknown DINO arch {arch}")
    ctor, importer = _DINO_ARCHS[arch]
    # All supported checkpoints were pretrained at 224^2.
    model = ctor(patch_size=patch_size, train_grid=224 // patch_size)
    if checkpoint_path is None:
        import os

        checkpoint_path = os.environ.get("DINO_CHECKPOINT") or None
    if checkpoint_path is None:
        import warnings

        warnings.warn(f"no checkpoint for {arch}/{patch_size}: using random weights")
        return model, None
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    return model, importer(ckpt, depth=model.depth)
