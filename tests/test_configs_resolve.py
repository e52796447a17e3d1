"""Every shipped config must resolve (inheritance + types) and build a model."""

import glob
import os

import pytest

from rcf_tpu.config import load_config
from rcf_tpu.models import MODEL_BUILDERS, build_from_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"), recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_resolves_and_builds(path):
    cfg = load_config(path)
    assert cfg.get("model_cls", "RCFModel") in MODEL_BUILDERS
    model = build_from_config(cfg)
    assert model is not None
    # Epoch/LR plumbing sanity.
    assert cfg.epochs > 0 and cfg.learning_rate > 0


def test_stage21_inherits_and_overrides():
    cfg = load_config(os.path.join(REPO, "configs/rcf/rcf_stage2.1.yaml"))
    assert cfg.epochs == 20
    assert cfg.learning_rate == 1e-5
    assert cfg.model_kwargs.w_crf == 10.0
    assert cfg.model_kwargs.backbone2.create_ema is True
    # Inherited untouched values from stage 1:
    assert cfg.model_kwargs.decode_head2.num_classes == 4
    assert cfg.train_dataset_kwargs.flow_suffix == "_NewCT"


def test_stv2_overrides():
    cfg = load_config(os.path.join(REPO, "configs/rcf_stv2/rcf_stage1.yaml"))
    assert cfg.model_kwargs.mask_size == [48, 48]
    assert cfg.model_kwargs.decode_head2.input_transform is None
    assert cfg.model_kwargs.decode_head.free_residual_with_affine is True
    assert cfg.model_kwargs.compactness_head.compact_channel == 0
    assert cfg.tpu.compute_dtype == "bfloat16"
    model = build_from_config(cfg)
    assert model.compact_channel == 0 and model.w_compactness == 1.0


def test_fbms_mask_layer_3():
    cfg = load_config(os.path.join(REPO, "configs/rcf_fbms59/rcf_stage2.2.yaml"))
    assert cfg.model_kwargs.mask_layer == 3
    assert cfg.model_kwargs.decode_head3.num_classes == 12
    assert cfg.model_kwargs.w_pl == 2.0
    assert cfg.get("override_max_epochs") == 4
