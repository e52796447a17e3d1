"""Resume-semantics contract tests (ADVICE r4 #1-#3, VERDICT r4 weak 4).

Cross-stage init (config ``pretrained_model: <prev>/last``) must be
weights-only: the reference loads a state_dict (`main.py:76-142`), never
optimizer state — a full restore resumes the poly LR schedule at the
previous stage's terminal count (training the new stage at ~min_lr) and
inflates auto-resume's step-derived epoch count on watchdog retries.

`last` saves must be rotation-atomic: orbax ``force=True`` deletes the
existing directory before the new save finalizes, so a watchdog kill during
the save d2h (the most-dropped relay RPC) would destroy the only resumable
checkpoint.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rcf_tpu.train.checkpoint import (TopKKeeper, find_resumable,
                                      restore_checkpoint, save_checkpoint)
from rcf_tpu.train.state import TrainState, poly_epoch_schedule


def _make_state(step=0, w=1.0, with_ema=False):
    schedule = poly_epoch_schedule(1e-4, 1e-6, 0.9, epochs=10, steps_per_epoch=5)
    tx = optax.chain(optax.add_decayed_weights(1e-4), optax.scale_by_adam(),
                     optax.scale_by_learning_rate(schedule))
    params = {"backbone2": {"w": jnp.full((3,), w)},
              "decode_head2": {"w": jnp.full((2,), w)}}
    stats = {"backbone2": {"mean": jnp.full((3,), w)}}
    opt_state = tx.init(params)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=stats, opt_state=opt_state, tx=tx,
                       ema_params=({"backbone2": params["backbone2"]} if with_ema else None),
                       ema_stats=({"backbone2": stats["backbone2"]} if with_ema else None))
    if step:
        # Advance the optimizer counts to mimic a trained previous stage.
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        for _ in range(step):
            state = state.apply_gradients(grads, state.batch_stats)
    return state


def _int_leaves(tree):
    return [int(x) for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.integer)]


def test_cross_stage_restore_is_weights_only(tmp_path):
    prev = _make_state(step=7, w=3.0)
    save_checkpoint(str(tmp_path), "last", prev)
    fresh = _make_state(step=0, w=0.0)
    restored = restore_checkpoint(str(tmp_path / "last"), fresh, weights_only=True)
    # Weights came over...
    np.testing.assert_allclose(np.asarray(restored.params["backbone2"]["w"]),
                               np.asarray(prev.params["backbone2"]["w"]))
    np.testing.assert_allclose(np.asarray(restored.batch_stats["backbone2"]["mean"]),
                               np.asarray(prev.batch_stats["backbone2"]["mean"]))
    # ...but the schedule restarts: step and every optimizer count stay 0,
    # so the new stage trains at its own base LR, not the previous stage's
    # terminal poly-decayed LR.
    assert int(restored.step) == 0
    assert all(c == 0 for c in _int_leaves(restored.opt_state)), \
        _int_leaves(restored.opt_state)
    # Full restore (same-stage auto-resume) keeps them — contrast check.
    full = restore_checkpoint(str(tmp_path / "last"), fresh)
    assert int(full.step) == 7
    assert any(c == 7 for c in _int_leaves(full.opt_state))


def test_cross_stage_restore_expands_ema_from_main_weights(tmp_path):
    """Stage-1 ckpt (no EMA) -> stage-2.1 model (EMA): main.py:98-107 rule."""
    prev = _make_state(step=3, w=2.0, with_ema=False)
    save_checkpoint(str(tmp_path), "last", prev)
    fresh = _make_state(step=0, w=0.0, with_ema=True)
    restored = restore_checkpoint(str(tmp_path / "last"), fresh, weights_only=True)
    np.testing.assert_allclose(np.asarray(restored.ema_params["backbone2"]["w"]),
                               np.asarray(prev.params["backbone2"]["w"]))
    assert int(restored.step) == 0


def test_last_save_rotates_instead_of_deleting(tmp_path):
    s1 = _make_state(step=1, w=1.0)
    s2 = _make_state(step=2, w=2.0)
    save_checkpoint(str(tmp_path), "last", s1)
    assert find_resumable(str(tmp_path)).endswith("last")
    save_checkpoint(str(tmp_path), "last", s2)
    # Both generations exist: a kill during the second save's d2h would have
    # left `last` (gen 1) intact; after the swap, `last.prev` is gen 1.
    assert os.path.isdir(tmp_path / "last")
    assert os.path.isdir(tmp_path / "last.prev")
    fresh = _make_state()
    cur = restore_checkpoint(str(tmp_path / "last"), fresh)
    assert int(cur.step) == 2
    prev = restore_checkpoint(str(tmp_path / "last.prev"), fresh)
    assert int(prev.step) == 1


def test_find_resumable_fallback_order(tmp_path):
    assert find_resumable(str(tmp_path)) is None
    os.makedirs(tmp_path / "last.prev")
    assert find_resumable(str(tmp_path)).endswith("last.prev")
    os.makedirs(tmp_path / "last.tmp")
    assert find_resumable(str(tmp_path)).endswith("last.tmp")
    os.makedirs(tmp_path / "last")
    assert find_resumable(str(tmp_path)).endswith("last")


def test_topk_keeper_persists_across_restart(tmp_path):
    s = _make_state(step=1)
    k1 = TopKKeeper(str(tmp_path), k=2)
    k1.save(s, 0.50, tag="e0")
    k1.save(s, 0.70, tag="e1")
    # Simulated watchdog kill + retry: a fresh keeper must remember the kept
    # set, so a mediocre post-resume epoch can't evict a better pre-kill one.
    k2 = TopKKeeper(str(tmp_path), k=2)
    assert sorted(m for m, _ in k2.kept) == [0.50, 0.70]
    k2.save(s, 0.60, tag="e2")
    names = {n for _, n in k2.kept}
    assert any("e1" in n for n in names)  # best survives
    assert any("e2" in n for n in names)  # 0.60 replaces 0.50
    assert not any("e0" in n for n in names)
    dirs = {e for e in os.listdir(tmp_path) if e.startswith("ckpt_")}
    assert dirs == names


def test_topk_keeper_drops_stale_entries(tmp_path):
    import shutil

    s = _make_state(step=1)
    k1 = TopKKeeper(str(tmp_path), k=2)
    k1.save(s, 0.50, tag="e0")
    shutil.rmtree(tmp_path / k1.kept[0][1])
    k2 = TopKKeeper(str(tmp_path), k=2)
    assert k2.kept == []


def test_object_channel_roundtrip(tmp_path):
    from rcf_tpu.train.loop import _load_object_channel, _save_object_channel

    assert _load_object_channel(str(tmp_path)) is None
    _save_object_channel(str(tmp_path), 2, epoch=4)
    assert _load_object_channel(str(tmp_path)) == 2


def test_direct_last_save_clears_stale_tmp(tmp_path):
    """A last.tmp left by an interrupted swap must not outlive a NEWER
    direct `last` save in find_resumable's fallback order."""
    os.makedirs(tmp_path / "last.tmp")  # stale leftover, no `last`
    s = _make_state(step=3)
    save_checkpoint(str(tmp_path), "last", s)
    assert not os.path.isdir(tmp_path / "last.tmp")
    assert find_resumable(str(tmp_path)).endswith("last")
