import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from rcf_tpu.grouping.ncut import ncut_refine, soft_ncut_value  # noqa: E402
from rcf_tpu.nn.dino_vit import _cubic_matrix, import_dino_torch, vit_small  # noqa: E402


def _torch_ncut(feats, mask, tau=0.2, eps=1e-5):
    f = feats[1:, :]
    f = F.normalize(f, p=2)
    a = (f @ f.T) > tau
    a = torch.where(a == 0, torch.tensor(eps, dtype=torch.float64), a.double())
    x = mask.reshape(-1).double()
    cut_ab = (1 - x) @ (a @ x)
    return cut_ab / torch.sum(a @ x) + cut_ab / torch.sum(a @ (1 - x))


def test_soft_ncut_matches_torch():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((65, 16)).astype(np.float32)
    mask = rng.random((8, 8)).astype(np.float32)
    ours = float(soft_ncut_value(jnp.asarray(feats), jnp.asarray(mask)))
    theirs = float(_torch_ncut(torch.from_numpy(feats), torch.from_numpy(mask)))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_ncut_refine_matches_torch_adam_loop():
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((37, 12)).astype(np.float32)
    mask = rng.random((6, 6)).astype(np.float32)

    ours = np.asarray(ncut_refine(jnp.asarray(feats), jnp.asarray(mask),
                                  steps=10, learning_rate=0.45, weight_decay=1e-6))

    # Reference loop (semantic_constraints.py:41-75), float32 like the original.
    tf = torch.from_numpy(feats)
    f = F.normalize(tf[1:, :], p=2)
    a = (f @ f.T) > 0.2
    a = torch.where(a == 0, torch.tensor(1e-5), a.float())
    m = torch.from_numpy(mask).clone().requires_grad_(True)
    opt = torch.optim.Adam([m], lr=0.45, weight_decay=1e-6)
    for _ in range(10):
        x = m.reshape(-1)
        ax = a @ x
        cut_ab = (1 - x) @ ax
        loss = cut_ab / torch.sum(ax) + cut_ab / torch.sum(a @ (1 - x))
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            m[:] = torch.clamp(m, 0.0, 1.0)
    np.testing.assert_allclose(ours, m.detach().numpy(), atol=2e-4)


def test_cubic_matrix_matches_torch_bicubic():
    rng = np.random.default_rng(2)
    n, dim = 14, 6
    grid = rng.standard_normal((1, n, n, dim)).astype(np.float32)
    for scale in ((10 + 0.1) / n, (27 + 0.1) / n):
        mh = _cubic_matrix(n, scale)
        ours = np.einsum("oh,bhwc->bowc", mh, grid)
        ours = np.einsum("pw,bowc->bopc", _cubic_matrix(n, scale), ours)
        theirs = F.interpolate(
            torch.from_numpy(grid).permute(0, 3, 1, 2), scale_factor=(scale, scale),
            mode="bicubic",
        ).permute(0, 2, 3, 1).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


class _TorchBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn_qkv = tnn.Linear(dim, dim * 3)
        self.attn_proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads
        self.dim = dim

    def forward(self, x, return_k=False):
        b, n, c = x.shape
        qkv = self.attn_qkv(self.norm1(x)).reshape(b, n, 3, self.heads, c // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if return_k:
            return k.transpose(1, 2).reshape(b, n, -1)
        attn = (q @ k.transpose(-2, -1)) * (c // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn_proj(out)
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


def test_dino_vit_k_features_match_torch_replica():
    torch.manual_seed(0)
    dim, heads, depth, p = 32, 4, 3, 8
    grid = 4  # trained at 32x32 with p=8

    blocks = [_TorchBlock(dim, heads) for _ in range(depth)]
    patch = tnn.Conv2d(3, dim, p, stride=p)
    cls_token = torch.randn(1, 1, dim) * 0.02
    pos_embed = torch.randn(1, grid * grid + 1, dim) * 0.02

    # Build the torch state dict in DINO naming.
    sd = {
        "cls_token": cls_token, "pos_embed": pos_embed,
        "patch_embed.proj.weight": patch.weight, "patch_embed.proj.bias": patch.bias,
        "norm.weight": torch.ones(dim), "norm.bias": torch.zeros(dim),
    }
    for i, blk in enumerate(blocks):
        sd.update({
            f"blocks.{i}.norm1.weight": blk.norm1.weight, f"blocks.{i}.norm1.bias": blk.norm1.bias,
            f"blocks.{i}.norm2.weight": blk.norm2.weight, f"blocks.{i}.norm2.bias": blk.norm2.bias,
            f"blocks.{i}.attn.qkv.weight": blk.attn_qkv.weight, f"blocks.{i}.attn.qkv.bias": blk.attn_qkv.bias,
            f"blocks.{i}.attn.proj.weight": blk.attn_proj.weight, f"blocks.{i}.attn.proj.bias": blk.attn_proj.bias,
            f"blocks.{i}.mlp.fc1.weight": blk.fc1.weight, f"blocks.{i}.mlp.fc1.bias": blk.fc1.bias,
            f"blocks.{i}.mlp.fc2.weight": blk.fc2.weight, f"blocks.{i}.mlp.fc2.bias": blk.fc2.bias,
        })

    from rcf_tpu.nn.dino_vit import DinoViT

    model = DinoViT(patch_size=p, embed_dim=dim, depth=depth, num_heads=heads, train_grid=grid)
    params = import_dino_torch(sd, depth=depth)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    ours_k = np.asarray(model.apply({"params": params}, jnp.asarray(x), return_last_k=True))

    with torch.no_grad():
        tx = patch(torch.from_numpy(x).permute(0, 3, 1, 2))
        tx = tx.flatten(2).transpose(1, 2)
        tx = torch.cat([cls_token, tx], dim=1) + pos_embed
        for blk in blocks[:-1]:
            tx = blk(tx)
        theirs_k = blocks[-1](tx, return_k=True).numpy()
    np.testing.assert_allclose(ours_k, theirs_k, atol=2e-4, rtol=1e-3)


def test_handcrafted_feature_fallback_gives_informative_affinity():
    """Without a DINO checkpoint, DinoFeatures uses centered color patch
    features; the NCut value must prefer the color-aligned grouping (a
    random ViT gave an uninformative affinity that collapsed the sc merge)."""
    from rcf_tpu.grouping.pipeline import DinoFeatures

    dino = DinoFeatures(checkpoint="/nonexistent", resize_imgs_size=(64, 64))
    img = np.zeros((64, 64, 3), np.float32)
    img[:, :32, 0] = 0.8  # left: red
    img[:, 32:, 2] = 0.8  # right: blue
    feats = dino(img[None])[0]
    assert feats.shape == (8 * 8 + 1, 3)

    grid = np.zeros((8, 8), np.float32)
    grid[:, :4] = 1.0  # color-aligned grouping
    aligned = float(soft_ncut_value(feats, jnp.asarray(grid)))
    crossed = float(soft_ncut_value(feats, jnp.asarray(grid.T)))  # cuts both colors
    assert aligned < crossed, (aligned, crossed)

    refined = ncut_refine(feats, jnp.asarray(grid))
    assert refined.shape == grid.shape
    # Refinement keeps (or sharpens) the aligned grouping — no collapse.
    assert float(refined[:, :4].mean()) > 0.6
    assert float(refined[:, 4:].mean()) < 0.4


def test_maa_elects_color_aligned_channel(tmp_path):
    """MAA (reference maa.py:19-36,398-402): -NCut must rank the channel whose
    mask matches the color grouping above a misaligned channel, end to end
    through the file-reading maa_for_channel path with the handcrafted
    affinity fallback."""
    from PIL import Image

    from rcf_tpu.grouping.maa import maa_for_channel
    from rcf_tpu.grouping.pipeline import DinoFeatures

    h, w = 64, 64
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2, 0] = 0.8
    img[:, w // 2:, 2] = 0.8
    images_dir = tmp_path / "imgs"
    (images_dir / "seq0").mkdir(parents=True)
    Image.fromarray((img * 255).astype(np.uint8)).save(images_dir / "seq0" / "00000.jpg")

    pred_dir = tmp_path / "export"
    for ch, mask in ((0, np.tile(np.arange(w) < w // 2, (h, 1))),  # aligned
                     (1, np.tile((np.arange(h) < h // 2)[:, None], (1, w)))):  # crossed
        (pred_dir / str(ch)).mkdir(parents=True)
        Image.fromarray((mask * 255).astype(np.uint8)).convert("L").save(
            pred_dir / str(ch) / "pred_seg_seq0_00000_0000000.png")

    dino = DinoFeatures(checkpoint="/nonexistent", resize_imgs_size=(64, 64))
    maa0 = maa_for_channel(dino, str(images_dir), str(pred_dir), 0, ["seq0"], 0, True)
    maa1 = maa_for_channel(dino, str(images_dir), str(pred_dir), 1, ["seq0"], 0, True)
    assert maa0 > maa1, (maa0, maa1)
