"""Measure per-recipe train-step time on the real TPU (or CPU).

Usage: python tools/time_recipes.py [stage1|stage21|amd|stv2] ...

Timing follows the axon-relay rule (see bench.py): block_until_ready acks
before remote execution completes, so each chain is fenced by a host read of
the final loss and the per-step time is the marginal time between two chain
lengths. Results print as one JSON line per recipe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg):
    print(f"[time] {msg}", file=sys.stderr, flush=True)


def _make_batch(b, i, hw, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "imgs": rng.standard_normal((b, i, hw, hw, 3)).astype(np.float32),
        "gt_fw_flows": (rng.standard_normal((b, i - 1, hw, hw, 2)) * 5).astype(np.float32),
        "gt_bw_flows": (rng.standard_normal((b, i - 1, hw, hw, 2)) * 5).astype(np.float32),
    }


def time_step(step, state, sharded, oc, short=3, long_=13):
    def run_chain(n, s):
        t0 = time.perf_counter()
        for k in range(n):
            s, losses = step(s, sharded, jax.random.PRNGKey(100 + k), oc)
        np.asarray(losses["loss"])
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    state, losses = step(state, sharded, jax.random.PRNGKey(0), oc)
    np.asarray(losses["loss"])
    _log(f"compile + first step: {time.perf_counter() - t0:.1f}s")
    t_short = run_chain(short, state)
    t_long = run_chain(long_, state)
    return (t_long - t_short) / (long_ - short)


def _common(model, cfg_extra=None, b=8, i=2, hw=384, crf_fn=None):
    from rcf_tpu.config import Config
    from rcf_tpu.parallel import create_mesh, replicate, shard_batch
    from rcf_tpu.train import create_train_state, make_train_step

    mesh = create_mesh()
    cfg = Config({
        "optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 1e-4,
        "epochs": 200, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
        "model_kwargs": {"backbone2": {"create_ema": True}}, **(cfg_extra or {}),
    })
    batch = _make_batch(b, i, hw)
    init_batch = {k: jnp.asarray(v[:2]) for k, v in batch.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch["imgs"], init_batch["gt_fw_flows"], init_batch["gt_bw_flows"],
        train=True)
    state = replicate(create_train_state(cfg, model, variables, 216), mesh)
    sharded = shard_batch(batch, mesh)
    step = make_train_step(model, donate=False, crf_fn=crf_fn)
    return step, state, sharded


def recipe_stage1(dtype):
    import __graft_entry__ as ge
    from rcf_tpu.models import build_model

    model = build_model(ge._model_kwargs(mask_size=(96, 96)), dtype=dtype)
    step, state, sharded = _common(model)
    per = time_step(step, state, sharded, jnp.zeros((), jnp.int32))
    return per, 16

def recipe_stage21(dtype):
    import __graft_entry__ as ge
    from rcf_tpu.models import build_model
    from rcf_tpu.ops.crf import make_crf_fn

    kwargs = ge._model_kwargs(mask_size=(96, 96))
    kwargs["w_crf"] = 10.0
    kwargs["crf_use_ema"] = True
    model = build_model(kwargs, dtype=dtype)
    import os

    res = int(os.environ.get("CRF_RES", "128"))
    engine = os.environ.get("CRF_ENGINE", None)
    crf_kwargs = {"resolution": (res, res)}
    if engine:
        crf_kwargs["engine"] = engine
    crf_fn = make_crf_fn(**crf_kwargs)
    step, state, sharded = _common(model, crf_fn=crf_fn)

    def step_set(s, batch, rng, oc, **kw):
        return step(s, batch, rng, oc, object_channel_set=True)

    per = time_step(step_set, state, sharded, jnp.zeros((), jnp.int32))
    return per, 16


def recipe_amd(dtype):
    from rcf_tpu.config import load_config
    from rcf_tpu.models.amd import build_amd_model

    cfg = load_config("configs/amd/amd.yaml")
    model = build_amd_model(cfg.model_kwargs.to_dict(), dtype=dtype)
    # AMD has no EMA (reference amd config); don't add one to the state.
    step, state, sharded = _common(
        model, cfg_extra={"model_kwargs": {"backbone2": {"create_ema": False}}}, b=8)
    per = time_step(step, state, sharded, jnp.zeros((), jnp.int32))
    return per, 16


RECIPES = {"stage1": recipe_stage1, "stage21": recipe_stage21, "amd": recipe_amd}


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import os

    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
    names = sys.argv[1:] or ["stage1"]
    for name in names:
        _log(f"=== {name} ===")
        per, frames = RECIPES[name](dtype)
        print(json.dumps({
            "recipe": name, "ms_per_step": round(per * 1000, 1),
            "frames_per_sec_per_chip": round(frames / per / len(jax.devices()), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
