"""End-to-end harness smoke test: 2 epochs of stage-1-shaped training on the
synthetic dataset, with validation, channel election, checkpointing, the
final hard-argmax test, and PNG export — all on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

from rcf_tpu.config import Config
from rcf_tpu.train.loop import run


def _cfg(davis_like, ckpt_dir, c=4):
    return Config({
        "batch_size": 4,
        "global_batch_size": 8,  # 7 train samples wrap-pad to one full batch
        "epochs": 2,
        "learning_rate": 1e-4,
        "optimizer": "adam",
        "weight_decay": 1e-4,
        "workers": 2,
        "checkpoints_dir": str(ckpt_dir),
        "pretrained_model": None,
        "model_cls": "RCFModel",
        "eval_pos_th": 0.35,
        "allow_overwriting_checkpoints_dir": True,
        "train_transform_kwargs": {"strong_aug": True, "crop_size": [64, 64], "base_scale": [9999, 72]},
        "test_transform_kwargs": {"strong_aug": False, "base_scale": [9999, 72]},
        "train_crop_size": [64, 64],
        "loss_log_interval": 1,
        "object_channel": None,
        "data_path": str(davis_like),
        "dataset_kwargs": {},
        "train_dataset_kwargs": {"frame_num": 2, "load_flow": True, "flow_suffix": "_T",
                                 "split": "trainval.txt", "zero_ann": False},
        "test_dataset_kwargs": {"frame_num": 1, "load_flow": False, "split": "val.txt",
                                "zero_ann": False},
        "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
        "set_object_channel_after_epoch": 1,
        "trainer_kwargs": {"check_val_every_n_epoch": 1},
        "eval_save": True,
        "eval_export": True,
        "export_all_seg": True,
        "model_kwargs": {
            "w_seg": 1.0, "w_entropy": 0.05, "separate_residual": True,
            "log_interval": 1,
            "mask_layer": c, "align_corners": False, "mask_size": [16, 16],
            "backbone2": {"type": "ResNet", "depth": 18, "num_stages": 4,
                          "out_indices": [0, 1, 2, 3], "strides": [1, 2, 1, 1],
                          "dilations": [1, 1, 2, 4], "contract_dilation": True,
                          "create_ema": False},
            "decode_head": {"type": "FlowAggregationHeadWithResidual", "mask_layer": c,
                            "num_flow_feat_channels": 16, "mask_size": [16, 16],
                            "clamp_flow_t": 20.0, "free_residual": True,
                            "allow_residual_resize": True, "create_flownet": True},
            "decode_head2": {"type": "FCNHead", "input_transform": "resize_concat",
                             "in_index": [0, 3], "channels": 16, "num_convs": 2,
                             "dilation": 6, "dropout_ratio": 0.1, "num_classes": c,
                             "concat_input": False},
            "decode_head3": {"type": "FCNHead", "in_index": -1, "channels": 16,
                             "num_convs": 2, "dilation": 6, "dropout_ratio": 0.1,
                             "num_classes": 4 * c, "concat_input": False},
        },
    })


@pytest.mark.slow
def test_full_run_trains_validates_elects_and_exports(davis_like, tmp_path):
    cfg = _cfg(davis_like, tmp_path / "ckpt")
    result = run(cfg, test_only=False, no_test=False)
    assert result is not None
    assert 0.0 <= result.miou <= 1.0
    assert np.isfinite(result.miou_frame_avg)
    # Checkpoints: last + at least one top-k.
    entries = os.listdir(tmp_path / "ckpt")
    assert "last" in entries
    assert any(e.startswith("ckpt_") for e in entries)
    # Training visualization grids were saved every log_interval step.
    vis_files = os.listdir(tmp_path / "ckpt" / "saved")
    assert any(f.endswith("_img_pred_recons.jpg") for f in vis_files)
    # Eval visualizations from the final test.
    assert len(os.listdir(tmp_path / "ckpt" / "saved_eval_test")) > 0
    # Export contract: per-channel subdirs with pred_seg_{seq}_{frame}_{iter:07}.png.
    export_dir = tmp_path / "ckpt" / "saved_eval_export"
    assert sorted(os.listdir(export_dir)) == ["0", "1", "2", "3"]
    files = sorted(os.listdir(export_dir / "0"))
    assert len(files) == 7
    assert files[0] == "pred_seg_bear_00000_0000000.png"


@pytest.mark.slow
def test_scan_steps_remainder_batches_are_not_dropped(davis_like, tmp_path):
    """steps_per_epoch % scan_k != 0: the remainder must still train.

    7 train samples wrap-pad to exactly 1 full batch per epoch; with
    tpu.scan_steps=2 the scan buffer never fills, so before the remainder
    flush the model took ZERO optimizer steps. Every batch must contribute
    a gradient step (state.step == epochs * steps_per_epoch).
    """
    cfg = _cfg(davis_like, tmp_path / "ckpt")
    cfg_d = cfg.to_dict()
    cfg_d["tpu"] = {"scan_steps": 2, "donate_state": False}
    cfg_d["epochs"] = 2
    cfg_d["trainer_kwargs"] = {"check_val_every_n_epoch": 0}  # no val: isolate training
    cfg_d["model_kwargs"]["log_interval"] = 1000  # skip vis
    state = run(Config(cfg_d), test_only=False, no_test=True)
    assert int(state.step) == 2, f"expected 2 optimizer steps, got {int(state.step)}"


@pytest.mark.slow
def test_auto_resume_and_checkpoint_cadence(davis_like, tmp_path):
    """Watchdog-retry contract: a re-run of the same checkpoints_dir resumes
    from `last` (start epoch = state.step // steps_per_epoch) instead of
    restarting at epoch 0, and checkpoint_every_n_epochs gates the per-epoch
    save-lottery draws (final epoch always saves)."""
    import json

    ckpt = tmp_path / "ckpt"
    cfg = _cfg(davis_like, ckpt)
    cfg["checkpoint_every_n_epochs"] = 2
    run(cfg, test_only=False, no_test=True)
    # Cadence: epoch 0 skipped ((0+1) % 2 != 0, not final), epoch 1 saved.
    tags = [e for e in os.listdir(ckpt) if e.startswith("ckpt_")]
    assert tags and all(t.startswith("ckpt_e1_") for t in tags), tags
    assert os.path.isdir(ckpt / "last")

    # Resume: 2 more epochs. steps_per_epoch is 1 here (7 samples wrap-pad
    # to one global batch), so a resumed run logs train steps {3, 4} while a
    # from-scratch rerun would log {1, 2, 3, 4} again.
    cfg2 = _cfg(davis_like, ckpt)
    cfg2["checkpoint_every_n_epochs"] = 2
    cfg2["epochs"] = 4
    run(cfg2, test_only=False, no_test=True)
    steps = [r["step"] for r in map(json.loads, open(ckpt / "metrics.jsonl"))
             if "train_loss" in r]
    assert steps == [1, 2, 3, 4], steps
