"""Test harness: force an 8-device virtual CPU mesh.

Mirrors the multi-chip test strategy (SURVEY.md §4): all sharding and
collective tests run on 8 virtual CPU devices.

Note: this image's sitecustomize registers the `axon` TPU backend and sets
`jax_platforms` programmatically at interpreter start, so an env-var
override is not enough — we must update jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, (
    "tests must run on the 8-device virtual CPU mesh, got: " + str(jax.devices())
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from PIL import Image  # noqa: E402


@pytest.fixture(scope="session")
def davis_like(tmp_path_factory):
    """Two tiny sequences in the reference's on-disk layout."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    h, w = 120, 214  # same 480x854 aspect, 4x smaller
    lines = []
    for seq, n in (("bear", 4), ("cows", 3)):
        for sub in ("JPEGImages/480p", "Annotations/480p", "Flows_T/480p", "BackwardFlows_T/480p"):
            (root / sub / seq).mkdir(parents=True, exist_ok=True)
        frames = []
        for i in range(n):
            name = f"{i:05d}"
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            Image.fromarray(img).save(root / "JPEGImages/480p" / seq / f"{name}.jpg")
            ann = (rng.random((h, w)) > 0.5).astype(np.uint8) * 255
            Image.fromarray(ann).save(root / "Annotations/480p" / seq / f"{name}.png")
            flow = rng.standard_normal((h, w, 2)).astype(np.float32) * 8
            np.save(root / "Flows_T/480p" / seq / f"{name}.npy", flow)
            np.save(root / "BackwardFlows_T/480p" / seq / f"{name}.npy", -flow)
            frames.append(f"{name}.jpg")
        lines.append(f"JPEGImages/480p/{seq}/ " + " ".join(frames))
    (root / "trainval.txt").write_text("\n".join(lines) + "\n")
    (root / "val.txt").write_text("\n".join(lines) + "\n")
    return root
