import pytest

from rcf_tpu.config import Config, apply_overrides, deep_merge, load_config, load_tree


@pytest.fixture()
def cfg_dir(tmp_path):
    (tmp_path / "base.yaml").write_text(
        """
batch_size: 8
learning_rate: 1.0e-4
use_flip: true
object_channel: null
model_kwargs:
  w_seg: 1.0
  mask_size: [96, 96]
  backbone2:
    depth: 50
"""
    )
    (tmp_path / "child.yaml").write_text(
        """
base_config: base.yaml
batch_size: 2
model_kwargs:
  w_seg: 0.1
  w_pl: 2.0
"""
    )
    return tmp_path


def test_inheritance_merges_child_over_base(cfg_dir):
    tree = load_tree(str(cfg_dir / "child.yaml"))
    assert tree["batch_size"] == 2
    assert tree["learning_rate"] == 1.0e-4
    assert tree["model_kwargs"]["w_seg"] == 0.1
    assert tree["model_kwargs"]["w_pl"] == 2.0
    assert tree["model_kwargs"]["backbone2"]["depth"] == 50
    assert "base_config" not in tree


def test_duplicate_keys_rejected(tmp_path):
    p = tmp_path / "dup.yaml"
    p.write_text("a: 1\na: 2\n")
    with pytest.raises(ValueError, match="duplicate"):
        load_tree(str(p))


def test_typed_overrides(cfg_dir):
    cfg = load_config(
        str(cfg_dir / "child.yaml"),
        opts=[
            "batch_size", "16",
            "use_flip", "false",
            "model_kwargs.w_seg", "2.5",
            "object_channel", "3",
        ],
    )
    assert cfg.batch_size == 16 and isinstance(cfg.batch_size, int)
    assert cfg.use_flip is False
    assert cfg.model_kwargs.w_seg == 2.5
    assert cfg.object_channel == 3


def test_override_missing_key_raises(cfg_dir):
    with pytest.raises(KeyError):
        load_config(str(cfg_dir / "base.yaml"), opts=["nope", "1"])


def test_lists_replaced_not_merged():
    merged = deep_merge({"a": [1, 2, 3]}, {"a": [4]})
    assert merged["a"] == [4]


def test_config_attribute_and_dict_access():
    cfg = Config({"a": {"b": 5}})
    assert cfg.a.b == 5
    assert cfg["a"]["b"] == 5
    assert cfg.get("missing", "d") == "d"
    cfg.c = 1
    assert cfg["c"] == 1


def test_apply_overrides_odd_count():
    with pytest.raises(ValueError):
        apply_overrides({"a": 1}, ["a"])
