"""Cross-replica BatchNorm semantics under global-view jit (the SyncBN
parity claim in nn/layers.py and PARITY.md §2.3): statistics computed over
a batch sharded across 8 devices must equal the unsharded computation —
i.e. XLA reduces over the GLOBAL batch, not per-shard."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rcf_tpu.parallel import create_mesh, replicate
from rcf_tpu.parallel.mesh import batch_sharding


class _BNNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)


def test_batchnorm_stats_are_global_across_shards():
    rng = np.random.default_rng(0)
    # Deliberately different distributions per shard: per-device BN would
    # produce very different outputs than global BN.
    x = np.concatenate(
        [rng.normal(loc=3.0 * k, scale=1.0 + 0.2 * k, size=(2, 4, 4, 8)) for k in range(8)]
    ).astype(np.float32)

    net = _BNNet()
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    mesh = create_mesh()
    variables_r = replicate(variables, mesh)

    @jax.jit
    def fwd(vars_, xs):
        return net.apply(vars_, xs, train=True, mutable=["batch_stats"])

    # Unsharded ground truth.
    out_ref, stats_ref = fwd(variables, jnp.asarray(x))
    # Sharded over the 8-device mesh.
    x_sharded = jax.device_put(x, batch_sharding(mesh))
    out_sh, stats_sh = fwd(variables_r, x_sharded)

    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats_sh["batch_stats"]["BatchNorm_0"]["mean"]),
        np.asarray(stats_ref["batch_stats"]["BatchNorm_0"]["mean"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats_sh["batch_stats"]["BatchNorm_0"]["var"]),
        np.asarray(stats_ref["batch_stats"]["BatchNorm_0"]["var"]), atol=1e-4)
    # Sanity: the global mean is far from any single shard's mean.
    shard_mean = x[:2].mean(axis=(0, 1, 2))
    global_mean = x.mean(axis=(0, 1, 2))
    assert np.abs(shard_mean - global_mean).max() > 1.0
