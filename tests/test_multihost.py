"""Real multi-process (multi-host) smoke test (VERDICT round-1 item 5).

Spawns 2 REAL processes, each with 4 virtual CPU devices, wired with
jax.distributed.initialize — the dryrun_multichip equivalent under actual
process boundaries. Verifies: global 8-device mesh, shard_batch assembling
a global array from process-local slices, and one full RCF train step
(fwd+bwd+Adam+EMA incl. cross-host gradient/BN reductions) agreeing with a
single-process run of the same global batch.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step(tmp_path, davis_like):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    shared = tmp_path / "artifacts"
    procs = [
        subprocess.Popen([sys.executable, worker, coord, str(pid), "2",
                          str(davis_like), str(shared)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=repo, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    losses, evals, vis_counts, exported, ckpts = {}, {}, {}, {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                _, pid, val = line.split()
                losses[int(pid)] = float(val)
            elif line.startswith("MULTIHOST_EVAL"):
                _, pid, miou, chan = line.split()
                evals[int(pid)] = (float(miou), int(chan))
            elif line.startswith("MULTIHOST_VIS"):
                _, pid, n = line.split()
                vis_counts[int(pid)] = int(n)
            elif line.startswith("MULTIHOST_EXPORT"):
                parts = line.split(" ", 2)
                names = parts[2].split(",") if len(parts) > 2 and parts[2] else []
                exported[int(parts[1])] = set(names)
            elif line.startswith("MULTIHOST_CKPT"):
                _, pid, resumable, step_val, has_prev = line.split()
                ckpts[int(pid)] = (resumable, int(step_val), int(has_prev))
    assert set(losses) == {0, 1}, outs
    # Both processes observe the same global loss.
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    # Eval smoke: sharded multi-host eval ran on both processes and they
    # accumulated IDENTICAL metrics + channel election (replicated probs).
    assert set(evals) == {0, 1}, outs
    assert evals[0][0] == pytest.approx(evals[1][0], rel=1e-6)
    assert evals[0][1] == evals[1][1]

    # Artifact-write gating (VERDICT r3 item 5): exactly ONE writer per file.
    # Batch visualizations: process 0 only.
    assert vis_counts.get(0, 0) > 0 and vis_counts.get(1, 0) == 0, vis_counts
    # Mask export: sharded by sequence — no file written twice, and the
    # union matches exactly what landed on the shared filesystem. (Both
    # fixture sequences happen to crc32-hash to process 1; ownership
    # balance is not the contract, single-writer-per-file is.)
    assert not (exported[0] & exported[1]), exported
    on_disk = {p.name for p in (shared / "export").glob("*.png")}
    assert (exported[0] | exported[1]) == on_disk and on_disk, exported

    # Checkpoint smoke under 2 real processes: the collective orbax save
    # succeeded on both, the SECOND save rotated last -> last.prev without
    # a cross-process rename race (single-writer gating in save_checkpoint),
    # and both processes restore the same resumable checkpoint.
    assert set(ckpts) == {0, 1}, outs
    assert ckpts[0] == ckpts[1]
    resumable, step_val, has_prev = ckpts[0]
    assert resumable == "last" and has_prev == 1
    assert step_val == 1  # one train step ran before the save

    # Single-process reference on the SAME global batch (8 virtual devices).
    ref = subprocess.run(
        [sys.executable, "-c", """
import os, sys
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, %r)
import numpy as np, jax.numpy as jnp
import __graft_entry__ as ge
from rcf_tpu.config import Config
from rcf_tpu.models import build_model
from rcf_tpu.parallel import create_mesh, replicate, shard_batch
from rcf_tpu.train import create_train_state, make_train_step
mesh = create_mesh()
model = build_model(ge._model_kwargs(mask_size=(8, 8)), dtype=jnp.float32)
rng = np.random.default_rng(0)
gb, hw = 8, 32
imgs = rng.standard_normal((gb, 2, hw, hw, 3)).astype(np.float32)
fw = (rng.standard_normal((gb, 1, hw, hw, 2)) * 4).astype(np.float32)
bw = (rng.standard_normal((gb, 1, hw, hw, 2)) * 4).astype(np.float32)
sharded = shard_batch({'imgs': imgs, 'gt_fw_flows': fw, 'gt_bw_flows': bw}, mesh)
variables = model.init({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
                       jnp.asarray(imgs[:2]), jnp.asarray(fw[:2]), jnp.asarray(bw[:2]), train=True)
cfg = Config({'optimizer': 'adam', 'learning_rate': 1e-3, 'weight_decay': 1e-4,
              'epochs': 10, 'lr_scheduler_kwargs': {'power': 0.9, 'min_lr': 1e-6},
              'model_kwargs': {'backbone2': {'create_ema': True}}})
state = replicate(create_train_state(cfg, model, variables, 10), mesh)
step = make_train_step(model, donate=False)
state, losses = step(state, sharded, jax.random.PRNGKey(2), jnp.zeros((), jnp.int32))
print('REF_LOSS', float(np.asarray(losses['loss'])))
""" % repo],
        capture_output=True, text=True, cwd=repo, env=env, timeout=900)
    assert ref.returncode == 0, ref.stdout + ref.stderr
    ref_loss = float([l for l in ref.stdout.splitlines()
                      if l.startswith("REF_LOSS")][0].split()[1])
    assert losses[0] == pytest.approx(ref_loss, rel=1e-4)
