"""Benchmark: RCF training throughput (frames/sec/chip) on TPU.

Headline metric: the stage-1 recipe (ResNet50 OS4/8 + FCN heads + relaxed
common-fate loss + EMA) at the published training shapes (384x384 crops,
2-frame windows) on synthetic data, measuring steady-state optimizer-step
throughput. Additionally (VERDICT r1 item 10) the stage-2.1 (fused
in-training CRF) and AMD (PWC-Lite flownet) recipes are benchmarked in
timeout-guarded subprocesses and reported as extra fields of the same JSON
line, so the driver artifact reflects every recipe the README claims.

The reference publishes no wall-clock numbers (SURVEY.md §6). `vs_baseline`
is measured against an estimated 100 frames/s/GPU for the reference's
PyTorch fp32 stage-1 recipe on an A100 (dilated output-stride-8 ResNet50
fwd+bwd at 384^2 with batch 8x2 frames) — see BASELINE.md; the absolute
`value` is the durable metric. `mfu` is measured FLOPs (XLA cost analysis,
scan-body counted once — validated against a CPU lowering) over the chip's
peak bf16 matmul throughput.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N, ...}

Compile-lottery defenses (rounds 2 AND 3 both lost the driver artifact to
rc=124 inside a single cold compile+first-step window; relay-side compiles
of the SAME program measured 44-1278s):
  1. AOT executables: `python bench.py --save-exe <recipe>` serializes the
     compiled step into `bench_cache/` IN THE REPO (survives the
     builder->driver boundary, unlike /tmp); the bench deserializes-and-
     loads it instead of compiling (see bench_aot.py).
  2. The headline itself runs in timeout-guarded subprocess attempts
     (BENCH_HEADLINE_ATTEMPTS x BENCH_HEADLINE_TIMEOUT): with 44-1278s
     observed variance, three independent draws beat one long draw. A
     final in-process attempt (old behavior) runs if all draws fail.
  3. The headline JSON line is printed IMMEDIATELY after the stage-1
     measurement; extras append an enriched second line (the driver
     parses the last `{`-line).

Env knobs: BENCH_DTYPE (bfloat16|float32), BENCH_BATCH (8),
BENCH_SCAN_K (auto|1|4...), BENCH_AOT (1|0 — use serialized executables),
BENCH_RECIPES (all|stage1), BENCH_EXTRA_TIMEOUT (s, per extra recipe),
BENCH_TOTAL_BUDGET (s, hard ceiling on extras; headline is never at risk),
BENCH_HEADLINE_ATTEMPTS / BENCH_HEADLINE_TIMEOUT (subprocess redraws).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

import bench_aot


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


def _configure_jax():
    import jax

    # Persist compiled executables across processes (the relay's remote
    # compile can take minutes; a cached hit skips it entirely).
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return jax


_CACHE_DIR = "/tmp/jax_cache"


def _warm_marker(recipe: str, scan_k: int) -> str:
    return os.path.join(_CACHE_DIR, f".bench_warm_{recipe}_k{scan_k}")


def _resolve_scan_k(recipe: str, env_var: str, fast_default: int = 1,
                    warm_default: int = 4) -> int:
    """Pick the scan-K dispatch factor without risking a cold 150s compile.

    "auto" (the default) chooses warm_default only when a prior bench run
    on this host compiled that exact program AND measured the compile
    genuinely fast (<60s, i.e. the persistent cache actually worked —
    compilation happens relay-side and the cache often does NOT help:
    44-1278s observed for "warm" programs). Otherwise the ~10x
    cheaper-to-compile per-step program. The driver's end-of-round run has
    a hard wall-clock budget and the headline prints only after this
    compile; losing ~1 ms/step of dispatch tail beats losing the artifact.
    """
    raw = os.environ.get(env_var, "auto")
    if raw != "auto":
        return int(raw)
    try:
        with open(_warm_marker(recipe, warm_default)) as f:
            if float(f.read().strip() or "inf") < 60.0:
                return warm_default
    except (OSError, ValueError):
        pass
    return fast_default


def _mark_warm(recipe: str, scan_k: int, compile_s: float) -> None:
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        with open(_warm_marker(recipe, scan_k), "w") as f:
            f.write(f"{compile_s:.1f}")
    except OSError:
        pass


def _peak_flops(dtype_name: str) -> float | None:
    import jax

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


def _measure_chain(step_call, state, fence) -> float:
    """Marginal time per dispatch between a 3- and a 13-call chain.

    On the axon relay, block_until_ready acks before remote execution
    completes — a host read of a chain-final value is the only reliable
    fence, so throughput is the marginal time between two chain lengths.

    The evolving state is threaded from chain to chain (never reused
    across calls): with donated steps the input state's buffers are
    consumed by each call, so restarting a chain from an already-donated
    state is what produced the round-1 "donation flakiness" — and
    donate=False was measured to cost ~115 ms/step of state-copy and
    allocation churn on the AMD step (tools/attrib_amd_step.py), badly
    under-reporting the real (donating) train loop.
    """
    def run_chain(n_steps: int, s):
        t0 = time.perf_counter()
        out = None
        for k in range(n_steps):
            s, out = step_call(s, k)
        fence(out)
        return time.perf_counter() - t0, s

    holder = state
    for attempt in range(3):
        try:
            t_short, holder = run_chain(3, holder)
            t_long, _ = run_chain(13, holder)
            return (t_long - t_short) / 10.0
        except Exception as exc:  # transient relay errors: retry
            _log(f"attempt {attempt}: {type(exc).__name__}: {exc}; retrying")
            time.sleep(5)
    raise RuntimeError("benchmark failed after 3 attempts")


def _result_dict(recipe: str, dtype_name: str, per_step: float, b: int, i: int,
                 n_chips: int, scan_k: int, flops_per_step: float | None,
                 aot: bool) -> dict:
    prefix = "amd" if recipe == "amd" else f"rcf_{recipe}"
    result = {
        "metric": f"{prefix}_train_throughput_{dtype_name}",
        "value": round(b * i / per_step / n_chips, 2),
        "unit": "frames/sec/chip",
        "scan_steps": scan_k,
    }
    if aot:
        result["aot"] = True
    if flops_per_step:
        achieved = flops_per_step / per_step / n_chips
        result["tflops_per_sec_per_chip"] = round(achieved / 1e12, 1)
        peak = _peak_flops(dtype_name)
        if peak:
            result["mfu"] = round(achieved / peak, 3)
    return result


def _bench_fingerprint(recipe: str, dtype_name: str, batch_per_chip: int) -> dict:
    fp = bench_aot.fingerprint(recipe, dtype_name, batch_per_chip)
    if recipe == "amd":
        # The whole-flow knob changes the compiled program; bake it into the
        # identity so an artifact saved with one default can never silently
        # shadow an A/B run with the other (BENCH_AMD_WHOLE).
        fp["whole_flow"] = os.environ.get("BENCH_AMD_WHOLE", "0") == "1"
    if recipe == "stage21":
        # Same rule for the CRF early-out knob (BENCH_CRF_SE).
        fp["stable_exit"] = os.environ.get("BENCH_CRF_SE", "1") == "1"
    return fp


def _bench_from_aot(recipe: str, dtype_name: str, b: int, i: int,
                    n_chips: int) -> dict | None:
    """Deserialize-and-load path: no relay-side compile at all."""
    if os.environ.get("BENCH_AOT", "1") != "1":
        return None
    loaded = bench_aot.load(
        recipe, _bench_fingerprint(recipe, dtype_name, b // n_chips))
    if loaded is None:
        return None
    try:
        compiled, flat, n_state, flops_per_step, scan_k = loaded
        state_leaves, rest = tuple(flat[:n_state]), tuple(flat[n_state:])
        t0 = time.perf_counter()
        out = compiled(*state_leaves, *rest)
        np.asarray(out[-1])  # loss fence
        _log(f"{recipe}: aot first step {time.perf_counter() - t0:.1f}s")

        def step_call(s, k):
            out = compiled(*s, *rest)
            return out[:-1], out[-1]

        per_dispatch = _measure_chain(step_call, out[:-1], np.asarray)
        per_step = per_dispatch / scan_k
        return _result_dict(recipe, dtype_name, per_step, b, i, n_chips,
                            scan_k, flops_per_step, aot=True)
    except Exception as exc:
        _log(f"{recipe}: aot path failed ({type(exc).__name__}: {exc}); "
             "falling back to compile")
        return None


def _stage_kwargs(recipe: str):
    import __graft_entry__ as ge

    mk = ge._model_kwargs(mask_size=(96, 96))
    if recipe == "stage21":
        # configs/rcf/rcf_stage2.1.yaml model_kwargs
        mk.update(w_seg=1.0, w_entropy=0.0, w_crf=10.0, crf_use_ema=True,
                  crf_pos_weight=2.0, crf_neg_weight=1.0, ema_m=0.999)
        mk["decode_head2"]["create_ema"] = True
        # stable_exit matches the shipped stage-2.1 default (MAP-stability
        # early-out, 99.95% MAP agreement vs fixed-50 at this grid —
        # tools/validate_crf_stable_exit.py). BENCH_CRF_SE=0 restores the
        # reference's fixed 50 iterations for A/Bs.
        mk["crf_head"] = {"type": "CRFHead", "resolution": [96, 96],
                          "stable_exit": os.environ.get("BENCH_CRF_SE", "1") == "1"}
    else:
        # The published stage-1 recipe trains WITHOUT EMA
        # (configs/rcf/rcf_stage1.yaml; EMA appears in stage 2.1).
        # BENCH_EMA=1 restores round-1's EMA-included stage-1 recipe to
        # attribute the r1->r2 gain: recipe change vs fused-conv/donation
        # levers (VERDICT r2 item 8).
        if os.environ.get("BENCH_EMA", "0") == "1":
            mk["backbone2"]["create_ema"] = True
            mk["decode_head2"]["create_ema"] = True
            mk["ema_m"] = 0.999
        else:
            mk["backbone2"].pop("create_ema", None)
    return mk


def _prepare_rcf(recipe: str, scan_k: int, donate: bool | None = None):
    """Build (step, state, sharded, oc, oc_set) for a stage recipe."""
    jax = _configure_jax()
    import jax.numpy as jnp

    from rcf_tpu.config import Config
    from rcf_tpu.models import build_model
    from rcf_tpu.parallel import create_mesh, replicate, shard_batch
    from rcf_tpu.train import create_train_state, make_train_step
    from rcf_tpu.train.step import make_scanned_train_step, stack_batches

    n_chips = len(jax.devices())
    mesh = create_mesh()

    # bf16 mixed precision (fp32 params/solves) is the TPU-native recipe;
    # the reference itself ships 16-bit AMP configs for STv2/FBMS59.
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    batch_per_chip = int(os.environ.get("BENCH_BATCH", "8"))  # reference per-GPU batch (README.md:75-77)
    b, i, hw = batch_per_chip * n_chips, 2, 384
    mk = _stage_kwargs(recipe)
    model = build_model(mk, dtype=dtype)
    crf_fn = None
    if model.w_crf > 0:
        from rcf_tpu.ops.crf import make_crf_fn

        crf_fn = make_crf_fn(**(model.crf_head_kwargs or {}))
    cfg = Config({
        "optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 1e-4,
        "epochs": 200, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
        "model_kwargs": {"backbone2": mk["backbone2"]},
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
    oc_set = recipe == "stage21"  # CRF loss requires an elected channel
    # Donation matches the production train loop; donate=False forces XLA
    # to copy the whole state per step (~115 ms on AMD, measured). The
    # round-1 "donation flakiness" was the old measurement chain reusing
    # an already-donated state, fixed in _measure_chain.
    if donate is None:
        donate = os.environ.get("BENCH_DONATE", "1") == "1"
    if scan_k > 1:
        step = make_scanned_train_step(model, scan_k, donate=donate, crf_fn=crf_fn)
        sharded = stack_batches([batch] * scan_k, mesh)
    else:
        step = make_train_step(model, donate=donate, crf_fn=crf_fn)
        sharded = shard_batch(batch, mesh)
    oc = jnp.zeros((), jnp.int32)
    return step, state, sharded, oc, oc_set, b, i, n_chips, dtype_name


def bench_rcf(recipe: str) -> dict:
    """stage1 / stage21: full train step (fwd, losses, bwd, Adam, EMA)."""
    jax = _configure_jax()

    n_chips = len(jax.devices())
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    b = int(os.environ.get("BENCH_BATCH", "8")) * n_chips

    aot_result = _bench_from_aot(recipe, dtype_name, b, 2, n_chips)
    if aot_result is not None:
        return aot_result

    # K optimizer steps per dispatch (the train loop's tpu.scan_steps mode,
    # parity-tested in tests/test_train_step.py): amortizes the ~1 ms relay
    # dispatch + host pytree plumbing. Default "auto": scan only when the
    # scanned program is known-cached (cold compile ~150s vs ~15s).
    scan_k = _resolve_scan_k(recipe, "BENCH_SCAN_K")
    step, state, sharded, oc, oc_set, b, i, n_chips, dtype_name = _prepare_rcf(
        recipe, scan_k)

    _log(f"compiling {recipe} train step on {n_chips} chip(s), batch {b}x{i} frames"
         f" @ 384^2 (scan_steps={scan_k})")
    t0 = time.perf_counter()
    lowered = step.lower(state, sharded, jax.random.PRNGKey(0), oc, object_channel_set=oc_set)
    compiled = lowered.compile()
    flops_per_step = _compiled_flops(compiled)  # scan body counted once
    state, losses = step(state, sharded, jax.random.PRNGKey(0), oc, object_channel_set=oc_set)
    np.asarray(losses["loss"])
    compile_s = time.perf_counter() - t0
    _log(f"compile + first step: {compile_s:.1f}s")
    if scan_k > 1:
        _mark_warm(recipe, scan_k, compile_s)

    def step_call(s, k):
        s, losses = step(s, sharded, jax.random.PRNGKey(100 + k), oc,
                         object_channel_set=oc_set)
        return s, losses

    per_dispatch = _measure_chain(step_call, state, lambda o: np.asarray(o["loss"]))
    per_step = per_dispatch / scan_k
    return _result_dict(recipe, dtype_name, per_step, b, i, n_chips, scan_k,
                        flops_per_step, aot=False)


def _amd_model_kwargs() -> dict:
    return {
        "w_seg": 1.0, "mask_layer": 5,
        # A/B knob for the reference's dead whole-flow loss. Default OFF
        # (round 4): under the parity stage-4 OS8 head, dropping it is ~31%
        # faster (339 vs 444-445 ms/step, sandwiched A/B). Under the old
        # pre-parity resize_concat head the OPPOSITE held (334 vs 401
        # ms/step — scheduling overlap), which is why this stayed ON until
        # re-measured; see models/amd/amd_model.py and RESULTS.md round 4.
        "log_whole_flow_loss": os.environ.get("BENCH_AMD_WHOLE", "0") == "1",
        # Reference AMD architecture (reference configs/amd/amd.yaml):
        # OS8 backbone with dilations [1,1,1,2], no contract_dilation, and
        # a single-input stage-4 mask head at 1/8 resolution.
        "backbone2": {"depth": 50, "num_stages": 4, "out_indices": [0, 1, 2, 3],
                      "strides": [1, 2, 1, 1], "dilations": [1, 1, 1, 2],
                      "contract_dilation": False},
        "decode_head2": {"in_index": 3, "channels": 256, "num_convs": 2,
                         "dilation": 6, "dropout_ratio": 0.1, "num_classes": 5,
                         "concat_input": False},
    }


def _prepare_amd(scan_k: int, donate: bool | None = None):
    jax = _configure_jax()
    import jax.numpy as jnp

    from rcf_tpu.config import Config
    from rcf_tpu.models.amd import build_amd_model
    from rcf_tpu.parallel import create_mesh, replicate, shard_batch
    from rcf_tpu.train import create_train_state, make_train_step
    from rcf_tpu.train.step import make_scanned_train_step, stack_batches

    n_chips = len(jax.devices())
    mesh = create_mesh()
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    b, hw = int(os.environ.get("BENCH_BATCH", "8")) * n_chips, 384
    model = build_amd_model(_amd_model_kwargs(), dtype=dtype)
    cfg = Config({
        "optimizer": "adam", "learning_rate": 1e-4, "weight_decay": 1e-6,
        "epochs": 8, "lr_scheduler_kwargs": {"power": 0.9, "min_lr": 1e-6},
        "model_kwargs": {},
    })
    rng = np.random.default_rng(0)
    batch = {"imgs": rng.standard_normal((b, 2, hw, hw, 3)).astype(np.float32)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batch["imgs"][:2]), train=True,
    )
    state = replicate(create_train_state(cfg, model, variables, steps_per_epoch=100), mesh)
    if donate is None:
        donate = os.environ.get("BENCH_DONATE", "1") == "1"
    if scan_k > 1:
        step = make_scanned_train_step(model, scan_k, donate=donate)
        sharded = stack_batches([batch] * scan_k, mesh)
    else:
        step = make_train_step(model, donate=donate)
        sharded = shard_batch(batch, mesh)
    oc = jnp.zeros((), jnp.int32)
    return step, state, sharded, oc, False, b, 2, n_chips, dtype_name


def bench_amd() -> dict:
    """AMD baseline: PWC-Lite cost volumes + unFlow loss, full train step."""
    jax = _configure_jax()

    n_chips = len(jax.devices())
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    b = int(os.environ.get("BENCH_BATCH", "8")) * n_chips

    aot_result = _bench_from_aot("amd", dtype_name, b, 2, n_chips)
    if aot_result is not None:
        return aot_result

    # Default scan_k=1 here: unlike the RCF recipes, scanning the AMD step
    # measured SLOWER than per-step dispatch with donation (456 vs 349
    # ms/step) — the dispatch tail it amortizes is already ~nil and the
    # scanned program schedules the Pallas warp kernels worse.
    scan_k = int(os.environ.get("BENCH_SCAN_K_AMD", "1"))
    step, state, sharded, oc, _, b, i, n_chips, dtype_name = _prepare_amd(scan_k)

    _log(f"compiling AMD train step on {n_chips} chip(s), batch {b}x2 @ 384^2"
         f" (scan_steps={scan_k})")
    t0 = time.perf_counter()
    state, losses = step(state, sharded, jax.random.PRNGKey(0), oc)
    np.asarray(losses["loss"])
    _log(f"compile + first step: {time.perf_counter() - t0:.1f}s")

    def step_call(s, k):
        s, losses = step(s, sharded, jax.random.PRNGKey(100 + k), oc)
        return s, losses

    per_step = _measure_chain(step_call, state, lambda o: np.asarray(o["loss"])) / scan_k
    return _result_dict("amd", dtype_name, per_step, b, i, n_chips, scan_k,
                        None, aot=False)


def save_exe(recipe: str) -> None:
    """Compile one recipe and serialize the executable into bench_cache/.

    Run at builder-session end (`python bench.py --save-exe stage1` etc.) so
    the driver's bench run deserializes instead of compiling. The scan_k
    baked into the artifact is the throughput-optimal one (the compile cost
    no longer matters on the load side).
    """
    jax = _configure_jax()

    scan_k_env = os.environ.get("BENCH_SCAN_K", "auto")
    # Inner step donate=False: donation happens at the flat-wrapper level
    # inside compile_and_save (inlined inner-jit donations are dropped).
    if recipe == "amd":
        scan_k = 1 if scan_k_env == "auto" else int(scan_k_env)
        step, state, sharded, oc, oc_set, b, i, n_chips, dtype_name = _prepare_amd(
            scan_k, donate=False)
    else:
        # Scan-4 amortizes the ~1 ms relay dispatch; its 10x costlier
        # compile is exactly what the AOT artifact exists to hide.
        scan_k = 4 if scan_k_env == "auto" else int(scan_k_env)
        step, state, sharded, oc, oc_set, b, i, n_chips, dtype_name = _prepare_rcf(
            recipe, scan_k, donate=False)

    _log(f"save-exe: compiling {recipe} (scan_steps={scan_k}) ...")
    fp = _bench_fingerprint(recipe, dtype_name, b // n_chips)
    example_args = (state, sharded, jax.random.PRNGKey(0), oc)
    donate = os.environ.get("BENCH_DONATE", "1") == "1"
    path, _ = bench_aot.compile_and_save(
        recipe, step, example_args, oc_set, fp, scan_k, donate=donate)
    # Smoke-test the artifact end to end in THIS process (deserialize,
    # materialize zero args, one step) so a broken artifact never ships.
    result = _bench_from_aot(recipe, dtype_name, b, i, n_chips)
    if result is None:
        raise RuntimeError(f"save-exe: round-trip check failed for {path}")
    _log(f"save-exe: round-trip ok: {json.dumps(result)}")


def _run_bench_subprocess(recipe: str, timeout_s: float,
                          env_extra: dict | None = None) -> dict | None:
    """Run one recipe in a subprocess (its compile can't hang us)."""
    try:
        env = dict(os.environ, **(env_extra or {}))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--recipe", recipe],
            capture_output=True, text=True, timeout=timeout_s, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        _log(f"{recipe}: no JSON in output (rc={proc.returncode}); "
             f"stderr tail: {proc.stderr[-300:]}")
    except subprocess.TimeoutExpired:
        _log(f"{recipe}: timed out after {timeout_s:.0f}s; skipping")
    except Exception as exc:
        _log(f"{recipe}: {type(exc).__name__}: {exc}; skipping")
    return None


def _headline() -> dict:
    """Measure stage-1 via timeout-guarded subprocess redraws.

    Each attempt is an independent draw from the relay's compile/client-init
    lottery (44-1278s observed for the same program); the AOT artifact makes
    a draw ~seconds when present and valid. The parent holds NO TPU client
    while attempts run (1-core host: contention roughly doubles both sides).
    A final unbounded in-process attempt preserves round-3 behavior if every
    draw fails.
    """
    attempts = int(os.environ.get("BENCH_HEADLINE_ATTEMPTS", "3"))
    # 480s covers the worst AOT-path draw observed so far: client init +
    # deserialize 8s + first EXECUTE 282s (the relay's program-load lottery
    # survives serialization; only the compile is gone) + measurement.
    timeout_s = float(os.environ.get("BENCH_HEADLINE_TIMEOUT", "480"))
    for k in range(attempts):
        _log(f"headline attempt {k + 1}/{attempts} (timeout {timeout_s:.0f}s)")
        result = _run_bench_subprocess("stage1", timeout_s)
        if result is not None:
            return result
    _log("all headline subprocess attempts failed; final in-process attempt")
    return bench_rcf("stage1")


def main() -> None:
    if "--save-exe" in sys.argv:
        save_exe(sys.argv[sys.argv.index("--save-exe") + 1])
        return
    if "--recipe" in sys.argv:
        recipe = sys.argv[sys.argv.index("--recipe") + 1]
        result = bench_amd() if recipe == "amd" else bench_rcf(recipe)
        print(json.dumps(result))
        return

    result = _headline()
    result["vs_baseline"] = round(
        result["value"] / A100_BASELINE_FRAMES_PER_SEC_PER_GPU, 3)
    # Headline FIRST, flushed: if the driver's wall-clock budget expires
    # during the extra recipes below, this line is what survives in the
    # artifact (round 2 printed it only at the end and lost everything).
    print(json.dumps(result), flush=True)

    if os.environ.get("BENCH_RECIPES", "all") == "all":
        per_extra = float(os.environ.get("BENCH_EXTRA_TIMEOUT", "420"))
        # Extras budget starts AFTER the headline lands: the headline's own
        # compile is tunnel-load-dependent (observed 44-242s warm for the
        # SAME cached program — compilation happens relay-side, so the
        # local persistent cache barely helps) and must never squeeze the
        # extras window — nor vice versa. Child client init is the same
        # lottery (observed 1-10 min). Extras stay subprocesses because an
        # in-process compile cannot be interrupted (observed a 21-minute
        # "warm" stage21 compile): enforced child timeouts guarantee rc=0
        # within ~headline+budget even when the tunnel is hostile, and the
        # already-printed headline makes a driver kill non-fatal anyway.
        budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "600"))
        # AMD runs FIRST (round-5 flip): in BENCH_r04 stage21 landed but
        # amd's single 420s draw lost the relay's program-load lottery
        # (first-execute of a deserialized exe observed 17.5-282s). The
        # first post-headline draw is the best one — the recipe with no
        # driver-captured number yet gets it — and each extra may take up
        # to BENCH_EXTRA_ATTEMPTS draws within the shared budget: two
        # short redraws beat one long draw under that load variance.
        order = os.environ.get("BENCH_EXTRA_ORDER", "amd,stage21").split(",")
        fields = {"stage21": "stage21_frames_per_sec_per_chip",
                  "amd": "amd_frames_per_sec_per_chip"}
        extra_attempts = int(os.environ.get("BENCH_EXTRA_ATTEMPTS", "2"))
        t_extras = time.perf_counter()
        for recipe in order:
            for attempt in range(1, extra_attempts + 1):
                remaining = budget - (time.perf_counter() - t_extras)
                if remaining < 30:
                    _log(f"{recipe}: total budget exhausted; skipping")
                    break
                _log(f"{recipe}: extra attempt {attempt}/{extra_attempts}")
                extra = _run_bench_subprocess(recipe, min(per_extra, remaining))
                if extra:
                    result[fields.get(recipe, recipe)] = extra["value"]
                    # Enrich immediately after EVERY landed extra (the
                    # driver parses the LAST `{`-line): a budget kill
                    # between extras then still keeps the earlier ones.
                    print(json.dumps(result), flush=True)
                    break


if __name__ == "__main__":
    main()
