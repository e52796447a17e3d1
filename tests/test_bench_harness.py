"""bench.py harness logic (no TPU): scan-K auto-resolution must never pick
the expensive-to-compile scanned program unless a prior run PROVED the
compile fast on this host (BENCH_r02.json was lost to a 153s cold compile;
relay-side compilation makes the persistent cache unreliable)."""

import importlib.util
import os
import sys


def _load_bench():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_scan_k_auto_prefers_cheap_compile(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("BENCH_SCAN_K", raising=False)

    # No marker: per-step program.
    assert bench._resolve_scan_k("stage1", "BENCH_SCAN_K") == 1

    # Marker recording a SLOW compile (cache didn't actually help): still 1.
    bench._mark_warm("stage1", 4, compile_s=153.2)
    assert bench._resolve_scan_k("stage1", "BENCH_SCAN_K") == 1

    # Marker recording a genuinely fast compile: the scanned program is safe.
    bench._mark_warm("stage1", 4, compile_s=15.3)
    assert bench._resolve_scan_k("stage1", "BENCH_SCAN_K") == 4

    # Explicit env override always wins.
    monkeypatch.setenv("BENCH_SCAN_K", "1")
    assert bench._resolve_scan_k("stage1", "BENCH_SCAN_K") == 1
    monkeypatch.setenv("BENCH_SCAN_K", "8")
    assert bench._resolve_scan_k("stage1", "BENCH_SCAN_K") == 8

    # Corrupt marker degrades to the cheap default, not a crash.
    monkeypatch.delenv("BENCH_SCAN_K", raising=False)
    with open(bench._warm_marker("stage1", 4), "w") as f:
        f.write("not-a-number")
    assert bench._resolve_scan_k("stage1", "BENCH_SCAN_K") == 1


def test_amd_fingerprint_tracks_whole_flow_knob(monkeypatch):
    """The BENCH_AMD_WHOLE knob changes the compiled program, so it must be
    part of the AOT-artifact identity: an amd.jexe saved with one default
    must never be loaded for an A/B arm running the other (bench.py
    _bench_fingerprint). RCF recipes are knob-free and must not carry it."""
    bench = _load_bench()

    monkeypatch.delenv("BENCH_AMD_WHOLE", raising=False)
    fp_off = bench._bench_fingerprint("amd", "bfloat16", 8)
    assert fp_off["whole_flow"] is False  # round-4 default: dead compute off

    monkeypatch.setenv("BENCH_AMD_WHOLE", "1")
    fp_on = bench._bench_fingerprint("amd", "bfloat16", 8)
    assert fp_on["whole_flow"] is True
    assert fp_on != fp_off  # load() compares dicts: mismatch -> fallback

    assert "whole_flow" not in bench._bench_fingerprint("stage1", "bfloat16", 8)


def test_bench_cache_artifacts_not_stale():
    """bench_cache/*.jexe are load-bearing for the driver bench: on any
    fingerprint mismatch the bench silently reverts to the compile-lottery
    path that killed the round-2/3 artifacts (VERDICT r4 weak 3). Fail
    loudly at builder time on the env-portable fields (jax version; device
    kind/count are only checkable on the TPU itself)."""
    import glob
    import pickle

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "bench_cache", "*.jexe")))
    assert paths, "no AOT bench executables shipped in bench_cache/"
    for p in paths:
        with open(p, "rb") as f:
            blob = pickle.load(f)
        fp = blob["fingerprint"]
        assert fp["jax"] == jax.__version__, (
            f"{os.path.basename(p)} was serialized under jax {fp['jax']} but the "
            f"live jax is {jax.__version__}: the driver bench will fall back to "
            f"compiling — regenerate on the TPU with "
            f"`python bench.py --save-exe {fp['recipe']}`")
        for key in ("payload", "in_tree", "out_tree", "arg_specs", "n_state",
                    "scan_k"):
            assert key in blob, f"{os.path.basename(p)} missing {key}"
