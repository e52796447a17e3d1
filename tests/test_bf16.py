"""Mixed precision (bf16 compute, fp32 params/stats/solves) sanity."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rcf_tpu.config import Config
from rcf_tpu.models import build_model
from rcf_tpu.parallel import create_mesh, replicate, shard_batch
from rcf_tpu.train import create_train_state, make_train_step
from tests.test_train_step import _cfg, _np_batch, _tiny_model_kwargs


@pytest.mark.slow  # see tests/README.md time budget
def test_bf16_train_step_finite_and_learns():
    mk = _tiny_model_kwargs(ema=True)
    model = build_model(mk, dtype=jnp.bfloat16)
    cfg = _cfg(mk)
    rng = np.random.default_rng(0)
    batch = _np_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batch["imgs"]), jnp.asarray(batch["gt_fw_flows"]),
        jnp.asarray(batch["gt_bw_flows"]), train=True,
    )
    # Parameters stay fp32 (mixed precision), compute casts to bf16.
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(variables["params"]))
    mesh = create_mesh()
    state = replicate(create_train_state(cfg, model, variables, steps_per_epoch=4), mesh)
    step = make_train_step(model, donate=False)
    sharded = shard_batch(batch, mesh)
    oc = jnp.zeros((), jnp.int32)
    s, losses = step(state, sharded, jax.random.PRNGKey(2), oc)
    first = float(losses["loss"])
    assert np.isfinite(first)
    for k in range(5):
        s, losses = step(s, sharded, jax.random.PRNGKey(3 + k), oc)
    assert float(losses["loss"]) < first
