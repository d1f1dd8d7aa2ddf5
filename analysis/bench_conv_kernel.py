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

from intro_tc_vae_tpu.ops.conv_pallas import conv3x3_hybrid, conv3x3_pallas

# Calls chained per dispatch. The axon tunnel costs ~25 ms per jit
# round-trip, so K must make device math dominate: at K=10 a 0.26 ms
# conv measures as 2.7 ms (the tunnel, not the chip). K=200 puts the
# dispatch share under 2% for the smallest shape.
K = 200


def _xla_conv(x, w, preferred=True):
    # preferred_element_type=f32 matches the Pallas kernel's contraction
    # dtype for the value check, but its transpose rule produces an f32
    # cotangent against bf16 weights (dtype error under grad) — the grad
    # timing path uses the plain bf16 conv (MXU accumulation is f32
    # either way on TPU).
    kw = {"preferred_element_type": jnp.float32} if preferred else {}
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw,
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

    # Equality check on-device first — this is the compiled-Mosaic
    # correctness gate (the unit tests run the interpreter on CPU; this
    # run IS the on-hardware equality evidence). One jit: eager
    # dispatches through the axon tunnel cost ~100 s EACH, so everything
    # must fuse into one call.
    def _loss(conv):
        return lambda x, w: jnp.sum(conv(x, w).astype(jnp.float32) ** 2)

    @jax.jit
    def _check(x, w):
        y_p = pallas_fwd(x, w).astype(jnp.float32)
        y_x = _xla_conv(x, w).astype(jnp.float32)
        gp = jax.grad(_loss(pallas_fwd), argnums=(0, 1))(x, w)
        gx = jax.grad(_loss(lambda x, w: _xla_conv(x, w, preferred=False)),
                      argnums=(0, 1))(x, w)
        pairs = [(y_p, y_x)] + [(a.astype(jnp.float32), b.astype(jnp.float32))
                                for a, b in zip(gp, gx)]
        return [(jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(b)))
                for a, b in pairs]

    for name, (err, ref) in zip(("fwd", "dx", "dw"),
                                [(float(e), float(r))
                                 for e, r in _check(x, w)]):
        rel = err / max(ref, 1e-9)
        print(f"max |pallas - xla| {name}: {err:.3e} "
              f"(ref max {ref:.2f}, rel {rel:.1e}, dtype {dtype.__name__})")
        # bf16 has ~8 mantissa bits (rel step 2^-8 = 3.9e-3); a K=6*128
        # f32-accumulated contraction of bf16 operands stays within a few
        # ULPs of XLA's identically-typed contraction.
        assert rel < 3e-2, f"{name}: pallas != xla on this hardware"

    def grad_pallas(x, w):
        return jax.grad(lambda x, w: jnp.sum(pallas_fwd(x, w).astype(jnp.float32) ** 2),
                        argnums=(0, 1))(x, w)

    def grad_xla(x, w):
        return jax.grad(
            lambda x, w: jnp.sum(
                _xla_conv(x, w, preferred=False).astype(jnp.float32) ** 2),
            argnums=(0, 1))(x, w)

    def grad_hybrid(x, w):
        return jax.grad(
            lambda x, w: jnp.sum(
                conv3x3_hybrid(x, w, th).astype(jnp.float32) ** 2),
            argnums=(0, 1))(x, w)

    rows = [
        ("fwd xla", lambda x, w: _xla_conv(x, w), gflop),
        ("fwd pallas", pallas_fwd, gflop),
        ("fwd+bwd xla", grad_xla, 3 * gflop),
        ("fwd+bwd pallas", grad_pallas, 3 * gflop),
        ("fwd+bwd hybrid", grad_hybrid, 3 * gflop),
    ]
    print(f"shape [B={b}, {s}x{s}, 64->64] 3x3 SAME, {gflop:.1f} GFLOP fwd")
    for name, fn, g in rows:
        dt = _time(fn, x, w)
        print(f"  {name:16s} {dt*1e6:9.1f} us  {g/dt/1e3:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
