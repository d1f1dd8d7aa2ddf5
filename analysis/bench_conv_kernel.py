"""Microbench: Pallas output-pair-packed 3x3 conv vs XLA's emitter for
the flagship decoder's lane-starved shape (ops/conv_pallas.py).

Methodology matches bench.py --infer: K calls chained inside one jit via
lax.scan with a data dependence, so the number is device math, not
tunnel dispatch. Reports fwd and fwd+bwd TFLOP/s for both impls.

Usage: python analysis/bench_conv_kernel.py [--batch 64] [--size 64]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from intro_tc_vae_tpu.ops.conv_pallas import conv3x3_pallas

K = 10


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _time(fn, x, w, iters=3):
    """Median seconds per chained call (fn jitted, scan-chained K times)."""
    @jax.jit
    def chained(x, w):
        def body(carry, _):
            out = fn(carry, w)
            # data dependence without perturbing magnitude
            probe = out if isinstance(out, jax.Array) else out[0]
            carry = carry + 0.0 * jnp.mean(probe).astype(carry.dtype)
            return carry, ()
        c, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.mean(c)

    r = float(chained(x, w))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = float(chained(x, w))
        times.append((time.perf_counter() - t0) / K)
    assert np.isfinite(r)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--tile-h", type=int, default=0, help="0 = auto")
    args = ap.parse_args()
    b, s, th = args.batch, args.size, args.tile_h or None

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, s, s, 64), dtype) * 0.5
    w = jnp.asarray(rng.randn(3, 3, 64, 64), dtype) * 0.05
    gflop = 2 * b * s * s * 64 * 64 * 9 / 1e9

    pallas_fwd = functools.partial(conv3x3_pallas, tile_h=th)

    # value check on-device first
    y_p = pallas_fwd(x, w)
    y_x = _xla_conv(x, w)
    err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32) - y_x.astype(jnp.float32))))
    print(f"max |pallas - xla| fwd: {err:.3e} (dtype {dtype.__name__})")

    def grad_pallas(x, w):
        return jax.grad(lambda x, w: jnp.sum(pallas_fwd(x, w).astype(jnp.float32) ** 2),
                        argnums=(0, 1))(x, w)

    def grad_xla(x, w):
        return jax.grad(lambda x, w: jnp.sum(_xla_conv(x, w).astype(jnp.float32) ** 2),
                        argnums=(0, 1))(x, w)

    rows = [
        ("fwd xla", lambda x, w: _xla_conv(x, w), gflop),
        ("fwd pallas", pallas_fwd, gflop),
        ("fwd+bwd xla", grad_xla, 3 * gflop),
        ("fwd+bwd pallas", grad_pallas, 3 * gflop),
    ]
    print(f"shape [B={b}, {s}x{s}, 64->64] 3x3 SAME, {gflop:.1f} GFLOP fwd")
    for name, fn, g in rows:
        dt = _time(fn, x, w)
        print(f"  {name:16s} {dt*1e6:9.1f} us  {g/dt/1e3:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
