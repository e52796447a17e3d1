import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcf_tpu.config import Config
from rcf_tpu.models import build_model
from rcf_tpu.parallel import create_mesh, replicate, shard_batch
from rcf_tpu.train import create_train_state, make_eval_step, make_train_step, poly_epoch_schedule


def _tiny_model_kwargs(c=4, ema=False):
    return {
        "w_seg": 1.0,
        "w_entropy": 0.05,
        "separate_residual": True,
        "mask_layer": c,
        "mask_size": [8, 8],
        "backbone2": {
            "type": "ResNet", "depth": 18, "num_stages": 4,
            "out_indices": [0, 1, 2, 3], "strides": [1, 2, 1, 1],
            "dilations": [1, 1, 2, 4], "contract_dilation": True,
            "create_ema": ema,
        },
        "decode_head": {
            "type": "FlowAggregationHeadWithResidual", "mask_layer": c,
            "num_flow_feat_channels": 16, "mask_size": [8, 8],
            "clamp_flow_t": 20.0, "free_residual": True,
            "allow_residual_resize": True, "create_flownet": True,
        },
        "decode_head2": {
            "type": "FCNHead", "input_transform": "resize_concat",
            "in_index": [0, 3], "channels": 16, "num_convs": 2,
            "dilation": 6, "dropout_ratio": 0.1, "num_classes": c,
            "concat_input": False, "create_ema": ema,
        },
        "decode_head3": {
            "type": "FCNHead", "in_index": -1, "channels": 16,
            "num_convs": 2, "dilation": 6, "dropout_ratio": 0.1,
            "num_classes": 4 * c, "concat_input": False,
        },
    }


def _cfg(model_kwargs):
    return Config({
        "optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 1e-4,
        "epochs": 10, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
        "model_kwargs": model_kwargs,
    })


def _np_batch(rng, b=8, i=2, hw=32):
    return {
        "imgs": rng.standard_normal((b, i, hw, hw, 3)).astype(np.float32),
        "gt_fw_flows": (rng.standard_normal((b, i - 1, hw, hw, 2)) * 5).astype(np.float32),
        "gt_bw_flows": (rng.standard_normal((b, i - 1, hw, hw, 2)) * 5).astype(np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    mk = _tiny_model_kwargs(ema=True)
    model = build_model(mk)
    cfg = _cfg(mk)
    rng = np.random.default_rng(0)
    batch = _np_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batch["imgs"]), jnp.asarray(batch["gt_fw_flows"]), jnp.asarray(batch["gt_bw_flows"]),
        train=True,
    )
    mesh = create_mesh()
    state = replicate(create_train_state(cfg, model, variables, steps_per_epoch=4), mesh)
    return model, cfg, mesh, state, batch


def test_train_step_runs_sharded_and_updates(setup):
    model, cfg, mesh, state, batch = setup
    step = make_train_step(model, donate=False)
    sharded = shard_batch(batch, mesh)
    oc = jnp.zeros((), jnp.int32)
    new_state, losses = step(state, sharded, jax.random.PRNGKey(2), oc)
    assert np.isfinite(float(losses["loss"]))
    assert int(new_state.step) == int(state.step) + 1
    # Params changed.
    diff = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # Loss decreases over a few steps on a fixed batch.
    s = new_state
    first = float(losses["loss"])
    for k in range(5):
        s, losses = step(s, sharded, jax.random.PRNGKey(3 + k), oc)
    assert float(losses["loss"]) < first


def test_ema_tracks_params(setup):
    model, cfg, mesh, state, batch = setup
    step = make_train_step(model, donate=False)
    sharded = shard_batch(batch, mesh)
    oc = jnp.zeros((), jnp.int32)
    new_state, _ = step(state, sharded, jax.random.PRNGKey(2), oc)
    # EMA moved toward the new params but is not equal to them.
    e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
    e1 = jax.tree_util.tree_leaves(new_state.ema_params)[0]
    p1 = jax.tree_util.tree_leaves({k: new_state.params[k] for k in ("backbone2", "decode_head2")})[0]
    assert not np.allclose(np.asarray(e0), np.asarray(e1)) or np.allclose(np.asarray(e0), np.asarray(p1))
    # EMA includes batch stats.
    assert new_state.ema_stats is not None


def test_eval_step_and_ema_eval(setup):
    model, cfg, mesh, state, batch = setup
    for use_ema in (False, True):
        eval_step = make_eval_step(model, use_ema=use_ema)
        imgs = jnp.asarray(batch["imgs"][:, 0])
        probs = eval_step(state, imgs)
        assert probs.shape == (8, 8, 8, 4)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_poly_schedule_matches_reference_formula():
    sched = poly_epoch_schedule(1e-4, 1e-6, 0.9, epochs=200, steps_per_epoch=10)
    # Reference: lr(e) = (base - min) * (1 - e/E)^power + min  (main.py:294-297)
    for step, epoch in ((0, 0), (10, 1), (1999, 199)):
        expected = (1e-4 - 1e-6) * (1 - epoch / 200) ** 0.9 + 1e-6
        assert float(sched(step)) == pytest.approx(expected, rel=1e-6)


def test_iou_counts_match_numpy():
    from rcf_tpu.eval import iou_counts

    rng = np.random.default_rng(0)
    probs = rng.random((2, 8, 8, 3)).astype(np.float32)
    ann = rng.choice([0, 128, 255], size=(2, 16, 16)).astype(np.uint8)
    inter, union = iou_counts(jnp.asarray(probs), jnp.asarray(ann), pos_th=0.35)
    # Numpy reference mirroring main.py:209-238 / eval_utils.intersect_and_union.
    import torch
    import torch.nn.functional as F

    masks = F.interpolate(torch.from_numpy(probs).permute(0, 3, 1, 2), size=(16, 16),
                          mode="bilinear", align_corners=True).numpy()
    pred = (masks > 0.35).astype(np.int64)
    label = (ann.astype(np.int64) // 255)
    valid = ann != 128
    for b in range(2):
        for ch in range(3):
            p = pred[b, ch][valid[b]]
            l = label[b][valid[b]]
            i_ref = np.sum((p == 1) & (l == 1))
            u_ref = np.sum(p == 1) + np.sum(l == 1) - i_ref
            assert int(inter[b, ch]) == i_ref
            assert int(union[b, ch]) == u_ref


def test_iou_counts_hard_argmax_mode():
    from rcf_tpu.eval import iou_counts

    probs = np.zeros((1, 4, 4, 2), np.float32)
    probs[..., 1] = 0.6
    probs[..., 0] = 0.4
    ann = np.full((1, 4, 4), 255, np.uint8)
    inter, union = iou_counts(jnp.asarray(probs), jnp.asarray(ann), pos_th=-1)
    assert int(inter[0, 1]) == 16 and int(union[0, 1]) == 16
    assert int(inter[0, 0]) == 0


@pytest.mark.slow  # see tests/README.md time budget
def test_scanned_train_step_matches_sequential():
    """K scanned steps == K sequential steps (identical math, one dispatch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rcf_tpu.config import Config
    from rcf_tpu.models import build_model
    from rcf_tpu.train import create_train_state, make_train_step
    from rcf_tpu.train.step import make_scanned_train_step, stack_batches

    import __graft_entry__ as ge

    model = build_model(ge._model_kwargs(mask_size=(8, 8)), dtype=jnp.float32)
    cfg = Config({
        "optimizer": "adam", "learning_rate": 1e-3, "weight_decay": 1e-4,
        "epochs": 10, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
        "model_kwargs": {"backbone2": {"create_ema": True}},
    })
    rng = np.random.default_rng(0)
    k, b, hw = 3, 2, 32
    batches = [{
        "imgs": rng.standard_normal((b, 2, hw, hw, 3)).astype(np.float32),
        "gt_fw_flows": (rng.standard_normal((b, 1, hw, hw, 2)) * 4).astype(np.float32),
        "gt_bw_flows": (rng.standard_normal((b, 1, hw, hw, 2)) * 4).astype(np.float32),
    } for _ in range(k)]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batches[0]["imgs"]), jnp.asarray(batches[0]["gt_fw_flows"]),
        jnp.asarray(batches[0]["gt_bw_flows"]), train=True)

    base_rng = jax.random.PRNGKey(7)
    oc = jnp.zeros((), jnp.int32)

    state_seq = create_train_state(cfg, model, variables, steps_per_epoch=10)
    step = make_train_step(model, donate=False)
    seq_losses = []
    for bt in batches:
        rng_i = jax.random.fold_in(base_rng, int(state_seq.step))
        state_seq, losses = step(state_seq, {k2: jnp.asarray(v) for k2, v in bt.items()},
                                 rng_i, oc)
        seq_losses.append(float(losses["loss"]))

    state_scan = create_train_state(cfg, model, variables, steps_per_epoch=10)
    scan_step = make_scanned_train_step(model, k, donate=False)
    state_scan, losses_k = scan_step(state_scan, stack_batches(batches), base_rng, oc)

    # Scanned XLA program fuses differently -> small float drift compounds
    # through Adam; an RNG/math bug would diverge at the %% level.
    np.testing.assert_allclose(np.asarray(losses_k["loss"]), np.array(seq_losses), rtol=2e-3)
    # Early Adam updates are ~sign(g)*lr, so infinitesimal float drift can
    # flip individual near-zero-gradient elements by 2*lr; bound the param
    # gap by a few update magnitudes instead of element-wise rtol.
    lr = 1e-3
    for a, bb in zip(jax.tree_util.tree_leaves(state_seq.params),
                     jax.tree_util.tree_leaves(state_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=0, atol=2.5 * k * lr)
