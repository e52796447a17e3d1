"""Microbench: dilated 3x3 convs (ResNet50 OS8 layer3/4 shapes) vs their
exact space-to-batch equivalents on TPU.

A dilation-d conv over a grid is exactly d^2 independent ordinary convs
over the d-phase subgrids (every tap of an output pixel lands on the same
phase), so `conv_d(x) == batch_to_space(conv_1(space_to_batch(x, d)), d)`
bit-exactly per output pixel. If XLA's native rhs_dilation lowering
underperforms, running the backbone's dilated stages in the phase domain
is a pure win. Run: python tools/bench_dilated_conv.py

MEASURED DEAD END (v5e, 2026-08-18) — do not retry without new evidence:
  layer3 d2 @48^2: dilated 2.57 ms (34% MFU) | per-conv s2b 2.69 | phase 2.53
  layer4 d4 @48^2: dilated 2.90 ms (30% MFU) | per-conv s2b 2.92 | phase 3.51
XLA's rhs_dilation lowering is already near its layout-bound ceiling at
these shapes; the phase domain (batch x d^2, grid / d) tiles WORSE, and in
the composed stage-1 step a whole-stage phase-resident layer4 (p=2,
s2b/b2s amortized across the stage, parity-tested exact) measured
186.2 f/s vs 197.8 f/s baseline — the two layout transposes plus worse
bottleneck-conv tiling at 24^2 outweigh any conv win. An earlier
single-run 4.6 ms reading for the d=4 conv that motivated this experiment
did not reproduce (compiler autotuning variance); trust same-session A/Bs.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")


def same_conv(x, k, d):
    pad = d  # 3x3
    return lax.conv_general_dilated(x, k, (1, 1), ((pad, pad), (pad, pad)),
                                    rhs_dilation=(d, d), dimension_numbers=DIMS)


def s2b(x, d):
    """[B,H,W,C] -> [B*d*d, H/d, W/d, C] phase subgrids."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(b * d * d, h // d, w // d, c)


def b2s(x, d, b):
    n, h, w, c = x.shape
    x = x.reshape(b, d, d, h, w, c).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, h * d, w * d, c)


def conv_s2b(x, k, d):
    return b2s(lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMS), d, x.shape[0])


def conv_s2b_full(x, k, d):
    return b2s(lax.conv_general_dilated(
        s2b(x, d), k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMS), d, x.shape[0])


def timeit(f, *args, n=20):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    # (name, B, H, C, dilation): stage-1 bench shapes, bf16, B=16 frames.
    cases = [
        ("layer3 3x3 d2 (512ch @48^2)", 16, 48, 512, 2),
        ("layer4 3x3 d4 (512ch @48^2)", 16, 48, 512, 4),
    ]
    for name, b, hw, c, d in cases:
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.01, jnp.bfloat16)
        flops = 2 * b * hw * hw * 9 * c * c

        f_dil = jax.jit(lambda x, k, d=d: same_conv(x, k, d))
        f_s2b = jax.jit(lambda x, k, d=d: conv_s2b_full(x, k, d))
        # phase-resident: s2b/b2s amortized across a whole stage
        xp = s2b(x, d)
        f_phase = jax.jit(lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMS))

        # exactness
        a = np.asarray(f_dil(x, k), np.float32)
        bb = np.asarray(f_s2b(x, k), np.float32)
        err = np.abs(a - bb).max()

        t1, t2, t3 = timeit(f_dil, x, k), timeit(f_s2b, x, k), timeit(f_phase, xp, k)
        peak = 197e12
        print(f"{name}: dilated {t1*1e3:.2f} ms ({flops/t1/peak*100:.0f}% MFU) | "
              f"s2b+conv+b2s {t2*1e3:.2f} ms ({flops/t2/peak*100:.0f}%) | "
              f"phase-resident {t3*1e3:.2f} ms ({flops/t3/peak*100:.0f}%) | max|diff| {err:.2e}")


if __name__ == "__main__":
    main()
