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
