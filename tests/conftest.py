"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the multi-chip test strategy: all sharding/collective tests run on
`XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu`
(SURVEY.md §4 'Implication for the rebuild').
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
