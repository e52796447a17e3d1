"""YAML config system.

Capability parity with the reference config layer
(`utils/utils.py:36-148` in RCF-UnsupVideoSeg):

* YAML files with single-parent recursive inheritance through a
  ``base_config`` key (resolved relative to the child file's directory).
* Duplicate keys inside one YAML mapping are an error.
* Nested dict merge where the child wins; merging a dict over a non-dict
  (or vice versa) replaces the value; lists are replaced, never merged.
* Dotted, *typed* command-line overrides ``--opts a.b.c value`` where the
  value string is coerced to the type of the existing value.

Design differences from the reference: configs are held in a ``Config``
object (recursive attribute/dict hybrid) instead of an argparse
Namespace over raw dicts, and overrides may create new keys when the
target parent exists (the reference requires the key to pre-exist; we
keep that as the default and offer ``allow_new=True``).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Iterator, Mapping

import yaml


class _StrictLoader(yaml.SafeLoader):
    """SafeLoader that rejects duplicate keys within a mapping."""

    def construct_mapping(self, node, deep=False):
        seen = set()
        for key_node, _ in node.value:
            key = self.construct_object(key_node, deep=deep)
            if key in seen:
                raise ValueError(f"duplicate key {key!r} in YAML mapping")
            seen.add(key)
        return super().construct_mapping(node, deep)


class Config:
    """Attribute/dict hybrid over a nested configuration tree."""

    def __init__(self, tree: Mapping[str, Any] | None = None):
        object.__setattr__(self, "_tree", dict(tree or {}))

    # -- dict-like -----------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        value = self._tree[key]
        return Config(value) if isinstance(value, dict) else value

    def __setitem__(self, key: str, value: Any) -> None:
        self._tree[key] = value.to_dict() if isinstance(value, Config) else value

    def __contains__(self, key: str) -> bool:
        return key in self._tree

    def __iter__(self) -> Iterator[str]:
        return iter(self._tree)

    def keys(self):
        return self._tree.keys()

    def items(self):
        for key in self._tree:
            yield key, self[key]

    def get(self, key: str, default: Any = None) -> Any:
        return self[key] if key in self._tree else default

    # -- attribute-like ------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return self[key]
        except KeyError as exc:  # pragma: no cover
            raise AttributeError(f"config has no key {key!r}") from exc

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def to_dict(self) -> dict:
        return copy.deepcopy(self._tree)

    def __repr__(self) -> str:
        return f"Config({self._tree!r})"

    def __eq__(self, other: object) -> bool:
        if isinstance(other, Config):
            return self._tree == other._tree
        return self._tree == other


def _load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        tree = yaml.load(f, Loader=_StrictLoader)
    return tree if tree is not None else {}


def deep_merge(base: dict, child: dict) -> dict:
    """Return a new tree: ``child`` merged over ``base`` (child wins)."""
    merged = dict(base)
    for key, value in child.items():
        if key in merged and isinstance(merged[key], dict) and isinstance(value, dict):
            merged[key] = deep_merge(merged[key], value)
        else:
            merged[key] = copy.deepcopy(value)
    return merged


def load_tree(path: str) -> dict:
    """Load a YAML config file, resolving ``base_config`` inheritance."""
    tree = _load_yaml(path)
    if not isinstance(tree, dict):
        raise ValueError(f"{path}: top level must be a mapping")
    base_rel = tree.pop("base_config", None)
    if base_rel is None:
        return tree
    base_path = os.path.join(os.path.dirname(path), base_rel)
    return deep_merge(load_tree(base_path), tree)


def _coerce(key: str, raw: str, existing: Any) -> Any:
    """Coerce CLI string ``raw`` to the type of ``existing``."""
    if isinstance(existing, bool):
        lowered = raw.lower()
        if lowered in ("true", "1"):
            return True
        if lowered in ("false", "0"):
            return False
        raise ValueError(f"cannot parse {raw!r} as bool for {key}")
    if isinstance(existing, int) and not isinstance(existing, bool):
        return int(raw)
    if isinstance(existing, float):
        return float(raw)
    if existing is None or isinstance(existing, (list, dict)):
        # YAML-parse so `--opts x null`, `--opts y "[1, 2]"` work.
        return yaml.safe_load(raw)
    if raw in ("null", "~", "None"):
        # Allow nulling out string-valued keys (e.g. pretrained_model).
        return None
    return raw


def apply_overrides(tree: dict, opts: list[str], allow_new: bool = False) -> dict:
    """Apply detectron2-style ``KEY VALUE`` pair overrides in place."""
    if len(opts) % 2 != 0:
        raise ValueError(f"--opts expects KEY VALUE pairs, got odd count {len(opts)}")
    for key, raw in zip(opts[::2], opts[1::2]):
        parts = key.split(".")
        node = tree
        for part in parts[:-1]:
            node = node[part]
        leaf = parts[-1]
        if leaf not in node and not allow_new:
            raise KeyError(f"override target {key!r} does not exist in config")
        node[leaf] = _coerce(key, raw, node.get(leaf))
    return tree


def load_config(path: str, opts: list[str] | None = None, allow_new: bool = False) -> Config:
    """Load a config file with inheritance and CLI overrides applied."""
    tree = load_tree(path)
    if opts:
        apply_overrides(tree, opts, allow_new=allow_new)
    return Config(tree)
