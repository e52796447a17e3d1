"""Backend selection shared by every CLI entry point.

RCF_PLATFORM=cpu forces the CPU backend (this image's sitecustomize
registers the TPU backend programmatically, so JAX_PLATFORMS alone is not
honored), RCF_HOST_DEVICES=N adds a virtual N-device host mesh. Must run
before the first JAX computation (importing jax is fine; initializing a
backend is not), so each tool calls it at the top of its ``main``.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    if os.environ.get("RCF_HOST_DEVICES"):
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={os.environ['RCF_HOST_DEVICES']}"
            ).strip()
    if os.environ.get("RCF_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["RCF_PLATFORM"])
