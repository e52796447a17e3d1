from .amd import AMDModel, build_amd_model  # noqa: F401
from .rcf import RCFModel, build_model  # noqa: F401

MODEL_BUILDERS = {"RCFModel": build_model, "AMDModel": build_amd_model}


def build_from_config(cfg, dtype=None):
    """Dispatch on cfg.model_cls (the reference's stringly registry,
    `main.py:74`, made explicit)."""
    import jax.numpy as jnp

    name = cfg.get("model_cls", "RCFModel")
    if name not in MODEL_BUILDERS:
        raise KeyError(f"unknown model_cls {name!r}; known: {sorted(MODEL_BUILDERS)}")
    return MODEL_BUILDERS[name](cfg.model_kwargs.to_dict(), dtype=dtype or jnp.float32)
