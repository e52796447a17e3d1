import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.losses import (
    compactness_loss,
    entropy_loss,
    object_aware_sharpen_loss,
    pseudo_label_loss,
    sharpen,
    sharpen_loss,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _probs(rng, shape):
    logits = rng.standard_normal(shape).astype(np.float32)
    return np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))


def test_entropy_matches_reference_quirk():
    """Reference: -(p * log_softmax(p)).sum(maskdim).mean() with p already softmaxed."""
    rng = np.random.default_rng(0)
    p = _probs(rng, (2, 2, 4, 6, 6))  # [B, I, C-last? -> ours is channel-last]
    ours = float(entropy_loss(jnp.asarray(p)))
    tp = torch.from_numpy(p).permute(0, 1, 4, 2, 3)  # -> [B, I, H, W] with C at dim 2
    tp = torch.from_numpy(p).permute(0, 1, 4, 2, 3)
    theirs = float(-(tp * F.log_softmax(tp, dim=2)).sum(dim=2).mean())
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_sharpen_loss_matches_reference():
    rng = np.random.default_rng(1)
    p = _probs(rng, (2, 4, 5, 3))
    t = 0.25
    ours = float(sharpen_loss(jnp.asarray(p), t))
    tp = torch.from_numpy(p).permute(0, 3, 1, 2)
    target = tp.detach() ** (1.0 / t)
    target = target / target.sum(dim=1, keepdim=True)
    theirs = float(F.kl_div(F.log_softmax(tp, dim=1), target, reduction="none").mean())
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_object_aware_sharpen_matches_reference():
    rng = np.random.default_rng(2)
    p = _probs(rng, (2, 6, 6, 4))
    t = 0.25
    oc = 1
    ours = float(object_aware_sharpen_loss(jnp.asarray(p), t, oc))
    tp = torch.from_numpy(p).permute(0, 3, 1, 2)
    obj = tp[:, oc]
    rest = tp.detach().clone()
    rest[:, oc] = 0.0
    diff = (obj - rest.max(dim=1).values).abs()
    theirs = float((t - diff).clamp(min=0).mean())
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_pseudo_label_loss_matches_reference():
    rng = np.random.default_rng(3)
    pred = rng.random((2, 6, 6)).astype(np.float32)
    tgt = rng.random((2, 6, 6)).astype(np.float32)
    for pos_th in (-1.0, 0.35):
        ours = float(
            pseudo_label_loss(jnp.asarray(pred), jnp.asarray(tgt), pos_weight=2.0, neg_weight=1.0, pos_th=pos_th)
        )
        tt = torch.from_numpy(tgt)
        if pos_th != -1.0:
            tt = (tt > pos_th).float()
        tpred = torch.from_numpy(pred)
        pos = torch.clamp(tt - tpred, min=0) ** 2
        neg = torch.clamp(tt - tpred, max=0) ** 2
        theirs = float(pos.mean() * 2.0 + neg.mean() * 1.0)
        assert ours == pytest.approx(theirs, rel=1e-5)


def test_compactness_loss_matches_reference():
    rng = np.random.default_rng(4)
    m = rng.random((3, 12, 10)).astype(np.float32)
    ours = float(compactness_loss(jnp.asarray(m)))
    tm = torch.from_numpy(m)
    h, w = 12, 10
    yloc = torch.arange(h, dtype=torch.float32)[None, :, None] / h
    xloc = torch.arange(w, dtype=torch.float32)[None, None, :] / w
    cnt = tm.sum(dim=(1, 2), keepdim=True)
    yc = (yloc * tm).sum(dim=(1, 2), keepdim=True) / cnt
    xc = (xloc * tm).sum(dim=(1, 2), keepdim=True) / cnt
    err = (yloc - yc) ** 2 + (xloc - xc) ** 2
    theirs = float((err * tm).mean())
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_sharpen_sharpens():
    p = jnp.asarray([[0.6, 0.4]])
    s = sharpen(p, 0.25)
    assert float(s[0, 0]) > 0.6
    np.testing.assert_allclose(np.asarray(s).sum(-1), 1.0, atol=1e-6)
