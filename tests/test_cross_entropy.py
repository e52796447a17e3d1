import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.losses.cross_entropy import CrossEntropyLoss, binary_cross_entropy, cross_entropy

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_ce_matches_torch_with_ignore():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((6, 5)).astype(np.float32)
    labels = np.array([0, 1, 2, -100, 4, 3])
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ignore_index=-100))
    theirs = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels), ignore_index=-100))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_bce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 3)).astype(np.float32)
    targets = rng.random((4, 3)).astype(np.float32)
    ours = float(binary_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = float(F.binary_cross_entropy_with_logits(torch.from_numpy(logits), torch.from_numpy(targets)))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_loss_class_weighting():
    logits = jnp.asarray([[10.0, -10.0]])
    labels = jnp.asarray([0])
    loss = CrossEntropyLoss(loss_weight=2.0)(logits, labels)
    assert float(loss) == pytest.approx(2.0 * float(cross_entropy(logits, labels)), rel=1e-6)
