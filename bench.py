"""Benchmark: stage-1 RCF training throughput (frames/sec/chip) on TPU.

Runs the real stage-1 model (ResNet50 OS4/8 + FCN heads + relaxed
common-fate loss + EMA) at the published training shapes (384x384 crops,
2-frame windows) on synthetic data, measuring steady-state optimizer-step
throughput on the available chips.

The reference publishes no wall-clock numbers (SURVEY.md §6). `vs_baseline`
is measured against an estimated 100 frames/s/GPU for the reference's
PyTorch fp32 stage-1 recipe on an A100 (dilated output-stride-8 ResNet50
fwd+bwd at 384^2 with batch 8x2 frames) — see BASELINE.md; the absolute
`value` is the durable metric.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

A100_BASELINE_FRAMES_PER_SEC_PER_GPU = 100.0

# Peak dense-matmul throughput per chip, bf16 (f32 is half), for MFU.
_PEAK_BF16_TFLOPS = (
    ("v6", 918.0),      # Trillium / v6e
    ("v5p", 459.0),
    ("v5", 197.0),      # v5e / v5 lite
    ("v4", 275.0),
)


def _peak_flops(dtype_name: str) -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for key, tf in _PEAK_BF16_TFLOPS:
        if key in kind:
            return tf * 1e12 * (1.0 if dtype_name == "bfloat16" else 0.5)
    return None


def _compiled_flops(compiled) -> float | None:
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception as exc:
        _log(f"cost_analysis unavailable: {exc}")
        return None


def main() -> None:
    # Persist compiled executables across processes (the relay's remote
    # compile can take minutes; a cached hit skips it entirely).
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import __graft_entry__ as ge
    from rcf_tpu.config import Config
    from rcf_tpu.models import build_model
    from rcf_tpu.parallel import create_mesh, replicate, shard_batch
    from rcf_tpu.train import create_train_state, make_train_step

    n_chips = len(jax.devices())
    mesh = create_mesh()

    import os

    # bf16 mixed precision (fp32 params/solves) is the TPU-native recipe:
    # 155.5 vs 106.5 frames/s/chip measured on v5e; the reference itself
    # ships 16-bit AMP configs for STv2/FBMS59. Override with BENCH_DTYPE.
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    batch_per_chip = int(os.environ.get("BENCH_BATCH", "8"))  # reference per-GPU batch (README.md:75-77)
    b, i, hw = batch_per_chip * n_chips, 2, 384
    model = build_model(ge._model_kwargs(mask_size=(96, 96)), dtype=dtype)
    cfg = Config({
        "optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 1e-4,
        "epochs": 200, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
        "model_kwargs": {"backbone2": {"create_ema": True}},
    })
    rng = np.random.default_rng(0)
    batch = {
        "imgs": rng.standard_normal((b, i, hw, hw, 3)).astype(np.float32),
        "gt_fw_flows": (rng.standard_normal((b, i - 1, hw, hw, 2)) * 5).astype(np.float32),
        "gt_bw_flows": (rng.standard_normal((b, i - 1, hw, hw, 2)) * 5).astype(np.float32),
    }
    init_batch = {k: jnp.asarray(v[:2]) for k, v in batch.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch["imgs"], init_batch["gt_fw_flows"], init_batch["gt_bw_flows"], train=True,
    )
    state = replicate(create_train_state(cfg, model, variables, steps_per_epoch=216), mesh)
    # K optimizer steps per dispatch (the train loop's tpu.scan_steps mode,
    # parity-tested in tests/test_train_step.py): amortizes the ~1 ms relay
    # dispatch + host pytree plumbing. BENCH_SCAN_K=1 restores per-step
    # dispatch.
    scan_k = int(os.environ.get("BENCH_SCAN_K", "4"))
    from rcf_tpu.train.step import make_scanned_train_step, stack_batches

    if scan_k > 1:
        step = make_scanned_train_step(model, scan_k, donate=False)
        sharded = stack_batches([batch] * scan_k, mesh)
    else:
        # donate=False: buffer donation has shown InvalidArgument flakiness
        # through the axon relay; throughput impact is ~nil at this state size.
        step = make_train_step(model, donate=False)
        sharded = shard_batch(batch, mesh)
    oc = jnp.zeros((), jnp.int32)

    # Warmup / compile. NOTE: on the axon relay, block_until_ready acks
    # before remote execution completes — a host read of a chain-final value
    # is the only reliable fence, so throughput is measured as the marginal
    # time between two chain lengths, each fenced by reading the last loss.
    _log(f"compiling train step on {n_chips} chip(s), batch {b}x{i} frames @ {hw}^2"
         f" (scan_steps={scan_k})")
    t0 = time.perf_counter()
    lowered = step.lower(state, sharded, jax.random.PRNGKey(0), oc)
    compiled = lowered.compile()
    flops_per_dispatch = _compiled_flops(compiled)
    state, losses = step(state, sharded, jax.random.PRNGKey(0), oc)
    np.asarray(losses["loss"])
    _log(f"compile + first step: {time.perf_counter() - t0:.1f}s")

    def run_chain(n_steps: int, s) -> float:
        t0 = time.perf_counter()
        for k in range(n_steps):
            s, losses = step(s, sharded, jax.random.PRNGKey(100 + k), oc)
        np.asarray(losses["loss"])  # forces the whole chain
        return time.perf_counter() - t0

    short, long_ = 3, 13
    per_dispatch = None
    for attempt in range(3):
        try:
            t_short = run_chain(short, state)
            t_long = run_chain(long_, state)
            per_dispatch = (t_long - t_short) / (long_ - short)
            break
        except Exception as exc:  # transient relay errors: retry
            _log(f"attempt {attempt}: {type(exc).__name__}: {exc}; retrying")
            time.sleep(5)
    if per_dispatch is None:
        raise RuntimeError("benchmark failed after 3 attempts")
    per_step = per_dispatch / scan_k

    fps_per_chip = b * i / per_step / n_chips
    result = {
        "metric": f"rcf_stage1_train_throughput_{dtype_name}",
        "value": round(fps_per_chip, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_per_chip / A100_BASELINE_FRAMES_PER_SEC_PER_GPU, 3),
        "scan_steps": scan_k,
    }
    # Measured model FLOPs (XLA cost analysis) -> achieved TFLOP/s and MFU.
    # NOTE: cost_analysis counts a lax.scan/while body ONCE regardless of
    # trip count, so a scanned dispatch's flops are already per-step
    # (validated against a CPU lowering of the unscanned step: 8.80 vs
    # 8.71 TFLOP at the bench shapes).
    if flops_per_dispatch:
        achieved = flops_per_dispatch / per_step / n_chips
        result["tflops_per_sec_per_chip"] = round(achieved / 1e12, 1)
        peak = _peak_flops(dtype_name)
        if peak:
            result["mfu"] = round(achieved / peak, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
