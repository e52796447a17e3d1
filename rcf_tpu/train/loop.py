"""End-to-end train/eval harness.

Replaces the reference's Lightning `Model` + `Trainer` stack (`main.py`):
config-driven dataset/loader construction, a jitted sharded train step,
per-epoch validation with object-channel election, top-k checkpointing on
`val_miou_frame_avg`, the final hard-argmax test, and mask export.

Flow of one run (reference `main.py:384-481`):
  train epochs -> validate every epoch (threshold eval_pos_th, electing the
  object channel once after `set_object_channel_after_epoch`) -> keep top-2
  + last checkpoints -> final test with hard argmax (eval_pos_th=-1).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, VideoDataset, get_transform
from ..eval.harness import Evaluator, Exporter, frame_id_from_path
from ..models import build_from_config
from ..parallel import create_mesh, replicate, shard_batch
from ..utils import get_logger
from ..utils.watchdog import CKPT_GRACE_S, COMPILE_GRACE_S, DEFAULT_GRACE_S, Heartbeat
from .checkpoint import (TopKKeeper, find_resumable, load_pretrained,
                         restore_checkpoint, save_checkpoint)
from .state import create_train_state
from .step import make_eval_step, make_train_step

logger = get_logger()

# Liveness beats for an external watchdog (utils/watchdog.py): the relay can
# drop an RPC outright (observed: a checkpoint d2h frozen 28 min) and a hung
# client wedges the host's single relay slot; only kill+retry recovers.
# Rebound to <checkpoints_dir>/.heartbeat by run(); a no-op until then.
_hb = Heartbeat(None)


def _save_object_channel(ckpt_dir: str, channel: int, epoch: int) -> None:
    """Persist the elected object channel so a watchdog retry restores it
    (single writer: process 0, like every shared-filesystem artifact)."""
    import json

    path = os.path.join(ckpt_dir, "object_channel.json")
    tmp = path + ".tmp"
    try:
        with open(tmp, "w") as f:
            json.dump({"object_channel": int(channel), "elected_at_epoch": int(epoch)}, f)
        os.replace(tmp, path)
    except OSError as exc:
        logger.warning(f"could not persist object channel: {exc}")


def _load_object_channel(ckpt_dir: str) -> int | None:
    import json

    try:
        with open(os.path.join(ckpt_dir, "object_channel.json")) as f:
            return int(json.load(f)["object_channel"])
    except (OSError, ValueError, KeyError):
        return None


def _device_normalize(cfg) -> bool:
    tpu_cfg = cfg.get("tpu") if "tpu" in cfg else None
    return bool(tpu_cfg.get("device_normalize", False)) if tpu_cfg else False


def _transform(cfg, training: bool):
    tf = get_transform(cfg, training=training)
    if _device_normalize(cfg):
        tf.keep_uint8 = True
    return tf


def _build_loaders(cfg, training: bool):
    # `dataset_cls` registry (the reference looks classes up in module
    # globals, main.py:68-70; ours is explicit).
    dataset_registry = {"VideoDataset": VideoDataset}
    dataset_cls = dataset_registry[cfg.get("dataset_cls", "VideoDataset")]
    if training:
        ds = dataset_cls(cfg.data_path, training=True, **cfg.dataset_kwargs.to_dict(),
                         **cfg.train_dataset_kwargs.to_dict())
        tf = _transform(cfg, training=True)
        global_batch = int(cfg.get("global_batch_size", cfg.batch_size))
        # force_no_shuffle: deterministic order for visualization (main.py:324-328).
        shuffle = not bool(cfg.get("force_no_shuffle", False))
        return DataLoader(
            ds, tf, batch_size=global_batch, shuffle=shuffle,
            seed=int(cfg.get("seed", 0)), num_workers=int(cfg.get("workers", 8)),
            shard_index=jax.process_index(), num_shards=jax.process_count(),
        )
    data_path = cfg.get("test_data_path") or cfg.data_path
    kwargs = cfg.test_dataset_kwargs.to_dict()
    sub = kwargs.pop("subsample_frame_interval", None)
    ds = VideoDataset(data_path, training=False, **cfg.dataset_kwargs.to_dict(),
                      subsample_frame_interval=sub, **kwargs)
    tf = _transform(cfg, training=False)
    return DataLoader(
        ds, tf, batch_size=int(cfg.batch_size), shuffle=False, drop_last=False,
        num_workers=int(cfg.get("workers", 8)), group_by_shape=True,
    )


def _val_loader(cfg, subsample: int = 10):
    """Validation = test split subsampled every 10th frame (main.py:339-346)."""
    data_path = cfg.get("test_data_path") or cfg.data_path
    kwargs = cfg.test_dataset_kwargs.to_dict()
    kwargs.pop("subsample_frame_interval", None)
    ds = VideoDataset(data_path, training=False, **cfg.dataset_kwargs.to_dict(),
                      subsample_frame_interval=subsample, **kwargs)
    tf = _transform(cfg, training=False)
    return DataLoader(ds, tf, batch_size=int(cfg.batch_size), shuffle=False,
                      drop_last=False, num_workers=int(cfg.get("workers", 8)),
                      group_by_shape=True)


def _init_variables(cfg, model, rng_seed: int = 0):
    default_hw = cfg.train_transform_kwargs.get("crop_size", (384, 384))
    hw = tuple(cfg.get("train_crop_size", default_hw))
    imgs = jnp.zeros((2, 2, *hw, 3), jnp.float32)
    flows = jnp.zeros((2, 1, *hw, 2), jnp.float32)
    return model.init(
        {"params": jax.random.PRNGKey(rng_seed), "dropout": jax.random.PRNGKey(rng_seed + 1)},
        imgs, gt_fw_flows=flows, gt_bw_flows=flows, train=True,
    )


def evaluate(cfg, model, state, loader, eval_pos_th, object_channel, use_ema=False,
             exporter=None, display_all=False, name="val_miou", save_vis_dir=None,
             mesh=None):
    multiprocess = jax.process_count() > 1
    # Batch-level visualizations are cheap (one PNG per batch): process 0
    # writes them; mask export inside Exporter is sharded by sequence.
    if multiprocess and jax.process_index() != 0:
        save_vis_dir = None
    from ..parallel.mesh import batch_sharding, replicated

    # Multi-host: probs are all-gathered on device (replicated output) so
    # every process accumulates identical metrics — eval stays sharded over
    # ALL chips (the reference evaluates on rank 0 only, main.py:180-238)
    # and the channel election needs no extra broadcast.
    out_sharding = replicated(mesh) if (mesh is not None and multiprocess) else None
    eval_step = make_eval_step(model, use_ema=use_ema, out_sharding=out_sharding)
    evaluator = Evaluator(
        eval_pos_th=eval_pos_th,
        num_channels=model.mask_layer,
        object_channel=object_channel,
        exporter=exporter,
    )
    n_dev = len(mesh.devices.flatten()) if mesh is not None else 1
    target_b = int(getattr(loader, "batch_size", 0)) or None
    seen_sizes: set[tuple[int, int, int]] = set()
    for batch in loader:
        # Compile-shaped grace only on the FIRST beat of each (raw-batch,
        # source-size) bucket — that step may jit-compile mid-loop (relay
        # compiles are 44-1278 s). The compile itself is keyed on the PADDED
        # batch size; keying beats on the raw size is strictly finer, so the
        # only cost is an over-granted compile grace when a partial bucket
        # reuses an already-cached padded program — conservative, never
        # under-granted. Every later batch of the bucket runs a cached
        # program in seconds, so its beat keeps the steady-state grace: a
        # hung eval d2h is then detected in 15 min, not 40.
        size_key = (len(batch["imgs"]),) + tuple(batch["imgs"].shape[-3:-1])
        _hb.beat(COMPILE_GRACE_S if size_key not in seen_sizes else DEFAULT_GRACE_S)
        seen_sizes.add(size_key)
        imgs_host = batch["imgs"][:, 0]  # [B, H, W, 3]
        b_real = imgs_host.shape[0]
        if mesh is not None:
            # Shard eval over the data mesh. Partial buckets are padded to
            # the full batch size (one compiled shape per source-size
            # bucket) and the pad rows dropped after.
            pad_to = -(-(target_b or b_real) // n_dev) * n_dev
            imgs = imgs_host
            if b_real < pad_to:
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[:1], pad_to - b_real, axis=0)])
            if multiprocess:
                # The eval loader is not process-sharded (every host loads
                # the full split, deterministic order); each host feeds its
                # own row-slice of the padded batch to assemble the global
                # array — a plain device_put of host-local data would crash.
                pi, pc = jax.process_index(), jax.process_count()
                rows = imgs.shape[0] // pc
                local = imgs[pi * rows:(pi + 1) * rows]
                imgs = jax.make_array_from_process_local_data(
                    batch_sharding(mesh), local, imgs.shape)
            else:
                imgs = jax.device_put(imgs, batch_sharding(mesh))
        else:
            imgs = jnp.asarray(imgs_host)
        probs = eval_step(state, imgs)[:b_real]
        frame_ids = [frame_id_from_path(p[0]) for p in batch["paths"]]
        evaluator.process_batch(probs, jnp.asarray(batch["ann"]), batch["seq_names"], frame_ids)
        if save_vis_dir is not None:
            # One visualization per batch, matching rcf_model.py:241-308.
            from .visualize import save_eval_visualization

            vis_name = f"eval_{batch['seq_names'][0]}_{int(batch['seq_ids'][0])}_{frame_ids[0]}_0000000"
            save_eval_visualization(save_vis_dir, vis_name, np.asarray(imgs_host[0]), np.asarray(probs[0]))
    result = evaluator.finalize(display_all=display_all, name=name)
    logger.info(result.summary(name))
    return result


def run(cfg, test_only: bool = False, no_test: bool = False):
    ckpt_dir = cfg.checkpoints_dir
    os.makedirs(ckpt_dir, exist_ok=bool(cfg.get("allow_overwriting_checkpoints_dir", True)))
    # Liveness for the external watchdog. Every process writes its OWN beat
    # file (.heartbeat for process 0, .heartbeat.h<i> for the rest) so a
    # stall on any host is detected and attributed directly instead of
    # waiting for process 0 to block on the next collective. The first beat
    # carries the startup+first-compile grace.
    global _hb
    _hb = Heartbeat(ckpt_dir, host=jax.process_index())
    _hb.beat(COMPILE_GRACE_S)
    # Reproducibility: persist the fully resolved config (utils.dump_args
    # parity). Process 0 only — on a shared filesystem every host writing
    # the same path is a partial-write race.
    if jax.process_index() == 0:
        try:
            import yaml

            with open(os.path.join(ckpt_dir, "config_resolved.yaml"), "w") as f:
                yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
        except Exception as exc:
            logger.warning(f"could not dump resolved config: {exc}")
    save_eval = os.path.join(ckpt_dir, cfg.get("saved_eval_dir_name", "saved_eval"))
    save_export = os.path.join(ckpt_dir, cfg.get("saved_eval_export_dir_name", "saved_eval_export"))

    tpu_cfg = cfg.get("tpu") if "tpu" in cfg else None
    mesh = create_mesh(tuple(tpu_cfg.get("mesh_shape", [-1])) if tpu_cfg else (-1,))
    dtype = jnp.bfloat16 if (tpu_cfg and tpu_cfg.get("compute_dtype") == "bfloat16") else jnp.float32
    model = build_from_config(cfg, dtype=dtype)

    variables = _init_variables(cfg, model)
    pretrained = cfg.get("pretrained_model")
    restore_orbax_from = None
    ema_override = (None, None)
    if pretrained:
        import glob as globlib

        matches = globlib.glob(pretrained) if "*" in pretrained else [pretrained]
        if matches and os.path.isdir(matches[0]):
            restore_orbax_from = matches[0]  # our own orbax checkpoint
        elif matches and os.path.exists(matches[0]):
            variables = load_pretrained(
                pretrained, model, variables,
                backbone_only=bool(cfg.get("pretrained_model_backbone_only", False)),
                drop_decode_head2=bool(cfg.get("drop_head_decode_head2", False)),
            )
            ema_override = (variables.pop("ema_params", None), variables.pop("ema_stats", None))
        else:
            logger.warning(f"pretrained_model {pretrained} not found; using fresh init")

    # AMD flownet knobs (reference models/fcn_head.py:52-97): load a
    # PWC-Lite torch checkpoint into the flownet subtree; freezing is an
    # optimizer mask (train/state.py).
    head_cfg = cfg.model_kwargs.get("decode_head", {})
    if head_cfg.get("load_flownet", False):
        from .checkpoint import load_flownet as _load_flownet

        variables = _load_flownet(str(head_cfg["flow_model_path"]), variables)

    if test_only:
        steps_per_epoch = 1
    else:
        train_loader = _build_loaders(cfg, training=True)
        steps_per_epoch = max(len(train_loader), 1)

    state = create_train_state(cfg, model, variables, steps_per_epoch)
    if ema_override[0] is not None:
        state = state.replace(ema_params=ema_override[0], ema_stats=ema_override[1])
    # Auto-resume: watchdog retries must make monotonic progress. The relay
    # drops checkpoint-save d2h RPCs (observed 5x on 2026-08-20 alone), the
    # supervisor kills the stage, and without resume every retry restarts at
    # epoch 0 — a 40-epoch stage could then never pass its first save. orbax
    # finalizes atomically and `last` is rotated through last.tmp/last.prev
    # (checkpoint.py), so find_resumable always has a complete checkpoint.
    # Takes precedence over pretrained_model when both exist: on a stage-2.x
    # retry, <ckpt_dir>/last is further along than the stage-1 init.
    # state.step counts optimizer steps (incl. scan and remainder flush) OF
    # THIS STAGE ONLY (cross-stage init is weights-only), so
    # step // steps_per_epoch is the exact completed-epoch count. Known
    # resume deviation: the loader RNG restarts.
    start_epoch = 0
    resumed = False
    _resume_dir = find_resumable(ckpt_dir)
    if (not test_only and bool(cfg.get("auto_resume", True))
            and _resume_dir is not None):
        state = restore_checkpoint(_resume_dir, state)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        resumed = True
        logger.info(f"auto-resume from {_resume_dir}: step {int(state.step)}, "
                    f"starting at epoch {start_epoch}")
    elif restore_orbax_from is not None:
        # Cross-stage init: weights only — step and opt_state stay fresh so
        # the new stage's poly LR starts at its own base LR and watchdog
        # retries derive epochs from this stage's own step count.
        state = restore_checkpoint(restore_orbax_from, state, weights_only=True)
    state = replicate(state, mesh)

    object_channel = cfg.get("object_channel")
    if object_channel is None and os.environ.get("OBJECT_CHANNEL"):
        object_channel = int(os.environ["OBJECT_CHANNEL"])
    if object_channel is None and resumed:
        # A watchdog retry must not silently retrain pre-election (losses
        # gated on object_channel_set would regress; ADVICE r4 #2): the
        # election is persisted at election time and reloaded here.
        object_channel = _load_object_channel(ckpt_dir)
        if object_channel is not None:
            logger.info(f"restored elected object channel {object_channel}")
    logger.info(f"Using {object_channel} as object channel")

    eval_on_ema = bool(cfg.get("eval_on_ema", False))

    if test_only:
        exporter = None
        vis_dir = save_eval if cfg.get("eval_save") else None
        if cfg.get("eval_save") and cfg.get("eval_export"):
            exporter = Exporter(save_eval, save_export,
                                export_all_seg=bool(cfg.get("export_all_seg", False)),
                                object_channel=object_channel or 0,
                                process_index=jax.process_index(),
                                process_count=jax.process_count())
        test_loader = _build_loaders(cfg, training=False)
        result = evaluate(cfg, model, state, test_loader, float(cfg.eval_pos_th),
                          object_channel, use_ema=eval_on_ema, exporter=exporter,
                          display_all=True, name="test_miou", save_vis_dir=vis_dir, mesh=mesh)
        return result

    # ---------------- training ----------------
    donate = bool(tpu_cfg.get("donate_state", True)) if tpu_cfg else True
    scan_k = int(tpu_cfg.get("scan_steps", 1)) if tpu_cfg else 1
    train_step = make_train_step(model, donate=donate, crf_fn=_maybe_crf_fn(cfg, model))
    if scan_k > 1:
        # K optimizer steps per dispatch (tpu.scan_steps): amortizes
        # dispatch overhead; identical math (train/step.py).
        from .step import make_scanned_train_step, stack_batches

        scan_step = make_scanned_train_step(
            model, scan_k, donate=donate, crf_fn=_maybe_crf_fn(cfg, model))
    from .visualize import compose_train_grid, make_vis_step, save_train_grid

    # The vis step is a collective program: EVERY process must run it (a
    # process-0-only call would deadlock the mesh). Under multi-host its
    # outputs are replicated so process 0 — the only writer — can read them.
    multiprocess = jax.process_count() > 1
    if multiprocess:
        from ..parallel.mesh import replicated

        vis_sharding = replicated(mesh)
    else:
        vis_sharding = None
    vis_step = (make_vis_step(model, out_sharding=vis_sharding)
                if cfg.get("model_cls", "RCFModel") == "RCFModel" else None)
    vis_interval = int(cfg.model_kwargs.get("log_interval", 50))
    train_vis_dir = os.path.join(ckpt_dir, "saved")
    keeper = TopKKeeper(ckpt_dir, k=2)
    from .metrics import MetricsLogger, StepProfiler

    metrics_log = MetricsLogger(ckpt_dir)
    profiler = StepProfiler(
        tpu_cfg.get("profile_dir") if tpu_cfg else None,
        start=int(tpu_cfg.get("profile_start", 10)) if tpu_cfg else 10,
        steps=int(tpu_cfg.get("profile_steps", 5)) if tpu_cfg else 5,
    )
    base_rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    loss_log_interval = int(cfg.get("loss_log_interval", 100))
    set_after = int(cfg.get("set_object_channel_after_epoch", 1))
    val_every = int(cfg.get("trainer_kwargs", {}).get("check_val_every_n_epoch", 1)) if "trainer_kwargs" in cfg else 1
    epochs = int(cfg.get("override_max_epochs", cfg.epochs))
    # Save cadence: every epoch is reference parity (Lightning ModelCheckpoint,
    # main.py:434-436) and the default; the synthetic pipeline runner dials it
    # down because each save is an independent draw of the relay's
    # drop-the-d2h lottery. The final epoch always saves (`last` feeds the
    # next pipeline stage).
    ckpt_every = max(int(cfg.get("checkpoint_every_n_epochs", 1)), 1)

    global_step = start_epoch * steps_per_epoch
    # True whenever the NEXT train-step call may jit-compile (first call,
    # and again when the object-channel flip changes the traced program):
    # the step then blocks on a relay-side compile, so its preceding beat
    # must carry the compile grace, not the steady-state one.
    compile_pending = True
    remainder_pending = scan_k > 1  # the per-step flush program compiles separately
    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        epoch_t0 = time.time()
        oc = jnp.asarray(object_channel if object_channel is not None else 0, jnp.int32)
        scan_buf = []
        for batch in train_loader:
            arrays = {k: v for k, v in batch.items()
                      if k in ("imgs", "gt_fw_flows", "gt_bw_flows", "pl_masks")}
            rng = jax.random.fold_in(base_rng, global_step)
            if scan_k > 1:
                scan_buf.append(arrays)
                if len(scan_buf) < scan_k:
                    continue
                stacked = stack_batches(scan_buf, mesh)
                scan_buf = []
                profiler.maybe_start(global_step)
                if compile_pending:
                    _hb.beat(COMPILE_GRACE_S)
                state, losses = scan_step(state, stacked, base_rng, oc,
                                          object_channel_set=object_channel is not None)
                losses = jax.tree_util.tree_map(lambda x: x[-1], losses)
                sharded = jax.tree_util.tree_map(lambda x: x[-1], stacked)
                global_step += scan_k
                profiler.maybe_stop(global_step)
            else:
                sharded = shard_batch(arrays, mesh)
                profiler.maybe_start(global_step)
                if compile_pending:
                    _hb.beat(COMPILE_GRACE_S)
                state, losses = train_step(state, sharded, rng, oc,
                                           object_channel_set=object_channel is not None)
                global_step += 1
                profiler.maybe_stop(global_step)
            compile_pending = False
            _hb.beat()
            if global_step % loss_log_interval == 0:
                vals = {k: float(np.asarray(v)) for k, v in losses.items()}
                if not np.isfinite(vals["loss"]):
                    raise RuntimeError(f"loss is NaN at step {global_step}: {vals}")
                logger.info(f"epoch {epoch} step {global_step}: " +
                            " ".join(f"{k}={v:.4f}" for k, v in vals.items()))
                metrics_log.log(step=global_step, epoch=epoch,
                                **{f"train_{k}": v for k, v in vals.items()})
            if vis_step is not None and global_step % vis_interval == 0:
                try:
                    probs_v, flows_v = vis_step(state, sharded, rng, oc)
                    # Grid composition + write: process 0 only (every host
                    # writing the same filename on a shared filesystem is a
                    # partial-write race). `arrays["imgs"]` is this host's
                    # local slice; its row 0 IS global row 0 on process 0.
                    if jax.process_index() == 0:
                        grid = compose_train_grid(
                            np.asarray(arrays["imgs"]), np.asarray(probs_v),
                            jax.tree_util.tree_map(np.asarray, flows_v),
                            batch.get("pl_masks"),
                        )
                        frame_id = os.path.splitext(os.path.basename(batch["paths"][0][0]))[0]
                        save_train_grid(train_vis_dir, global_step, batch["seq_names"][0], frame_id, grid)
                except Exception as exc:  # parity: saving failures only warn
                    logger.warning(f"train visualization failed: {exc}")
        # Flush the epoch's scan remainder (< scan_k batches) through the
        # per-step program so every batch contributes a gradient step —
        # previously up to scan_k-1 batches/epoch were silently dropped
        # whenever steps_per_epoch % scan_k != 0.
        for arrays in scan_buf:
            sharded = shard_batch(arrays, mesh)
            rng = jax.random.fold_in(base_rng, global_step)
            if remainder_pending:
                _hb.beat(COMPILE_GRACE_S)
            state, losses = train_step(state, sharded, rng, oc,
                                       object_channel_set=object_channel is not None)
            global_step += 1
            remainder_pending = False
            _hb.beat()
        scan_buf = []
        logger.info(f"epoch {epoch} done in {time.time() - epoch_t0:.1f}s")

        if val_every > 0 and (epoch + 1) % val_every == 0:
            result = evaluate(cfg, model, state, _val_loader(cfg), float(cfg.eval_pos_th),
                              object_channel, use_ema=eval_on_ema, mesh=mesh)
            if object_channel is None and (epoch >= set_after - 1):
                object_channel = result.elected_channel
                logger.info(f"Set object channel to {object_channel} "
                            f"(channel distribution: {result.max_channel_freq})")
                if jax.process_index() == 0:
                    _save_object_channel(ckpt_dir, object_channel, epoch)
                # object_channel_set flips False->True: the next train-step
                # call traces and compiles a new program.
                compile_pending = True
                remainder_pending = scan_k > 1
            metrics_log.log(epoch=epoch, val_miou=result.miou,
                            val_miou_frame_avg=result.miou_frame_avg,
                            object_channel=object_channel)
            if (epoch + 1) % ckpt_every == 0 or epoch == epochs - 1:
                # checkpoint d2h is the observed hung-RPC site: tight grace
                _hb.beat(CKPT_GRACE_S)
                keeper.save(state, result.miou_frame_avg, tag=f"e{epoch}")
                _hb.beat()
        elif (epoch + 1) % ckpt_every == 0 or epoch == epochs - 1:
            # Validation disabled this epoch: still checkpoint `last`
            # (the reference's ModelCheckpoint runs regardless, main.py:434-436).
            _hb.beat(CKPT_GRACE_S)
            save_checkpoint(ckpt_dir, "last", state)
            _hb.beat()

    if not no_test:
        exporter = None
        test_vis_dir = os.path.join(ckpt_dir, "saved_eval_test") if cfg.get("eval_save") else None
        if cfg.get("eval_save") and cfg.get("eval_export"):
            exporter = Exporter(os.path.join(ckpt_dir, "saved_eval_test"), save_export,
                                export_all_seg=bool(cfg.get("export_all_seg", False)),
                                object_channel=object_channel or 0,
                                process_index=jax.process_index(),
                                process_count=jax.process_count())
        test_loader = _build_loaders(cfg, training=False)
        result = evaluate(cfg, model, state, test_loader, -1.0, object_channel,
                          use_ema=eval_on_ema, exporter=exporter, display_all=True,
                          name="test_miou", save_vis_dir=test_vis_dir, mesh=mesh)
        return result
    return state


def _maybe_crf_fn(cfg, model):
    if model.w_crf <= 0:
        return None
    from ..ops.crf import make_crf_fn

    return make_crf_fn(**(model.crf_head_kwargs or {}))


def restore(cfg, model, state, path):
    return restore_checkpoint(path, state)
