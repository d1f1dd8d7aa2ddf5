"""Benchmark: images/sec/chip on the flagship intro_tc recipe.

Runs the full two-phase Intro-TC train step (ukiyo_e64 shapes: 64x64x3,
z_dim 128, conv channels [64,128,256,512], batch 64 — reference
README.md:24-26 flagship command) on synthetic data resident on device,
and prints ONE JSON line:

    {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s",
     "vs_baseline": N / 20000}

vs_baseline is against the BASELINE.json north-star of >=20k img/s/chip.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64
IMAGE_SIZE = 64
ZDIM = 128
CHANNELS = (64, 128, 256, 512)
WARMUP = 3
ITERS = 30
NORTH_STAR = 20000.0


def main(batch=BATCH, image_size=IMAGE_SIZE, arch="conv", solver_name="intro_tc",
         tc_impl="xla", iters=ITERS, scan=1, fuse=True, emit=True, tb=False,
         pack=0, tile=0, remat=False, conv_impl="xla"):
    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    writer = None
    if tb:  # measure the full train_step with live TensorBoard writes
        import tempfile

        from intro_tc_vae_tpu.utils import make_writer

        writer = make_writer(log_dir=tempfile.mkdtemp(prefix="itcvae-tbbench-"))

    precision = "bf16" if jax.devices()[0].platform == "tpu" else "fp32"
    dtype = jnp.bfloat16 if precision == "bf16" else None
    channels = {64: (64, 128, 256, 512), 128: (64, 128, 256, 512, 512),
                256: (64, 128, 256, 512, 512, 512)}[image_size]

    dataset = Synthetic(image_size=image_size, cdim=3, sizes=(4, 5, 8, 8))
    kwargs = dict(cdim=3, zdim=ZDIM, channels=channels, image_size=image_size,
                  dtype=dtype, tile_rows=tile, conv_impl=conv_impl,
                  remat=remat in (True, "block"))
    solver = make_solver(
        solver_name,
        dataset=dataset,
        encoder=Encoder(arch=arch, **kwargs),
        decoder=Decoder(arch=arch, pack_predict=pack, **kwargs),
        batch_size=batch,
        optimizer_e=make_optimizer("adam", 2e-4),
        optimizer_d=make_optimizer("adam", 2e-4),
        beta_kl=0.5,
        beta_rec=0.75,
        beta_neg=512.0,
        gamma_r=1e-8,
        tc_impl=tc_impl,
        scan_steps=scan,
        fuse_passes=fuse,
        writer=writer,
        test_iter=10**9,  # TB bench: scalar writes only, no image/metric dumps
        remat_passes=remat == "pass",
    )

    x = jnp.asarray(dataset.get_batch(np.arange(batch) % len(dataset)))
    state = solver.init_state(jax.random.key(0), x)
    if scan > 1:
        x = jnp.broadcast_to(x[None], (scan, *x.shape))

    def run_step(st, xx, it):
        if tb:  # full host path: one-step-behind scalar writes included
            return solver.train_step(st, xx, it)
        return solver._step_fn(st, xx)

    # warmup / compile. NOTE: on the axon tunnel block_until_ready returns
    # before execution finishes; only a host value fetch forces the chain,
    # so timing brackets use float() fetches of chain-dependent values.
    # scan>1 returns the stacked [K] metric tree; fetch the last entry
    fetch = lambda m: float(np.asarray(m["loss_enc"]).reshape(-1)[-1])
    for w in range(WARMUP):
        state, metrics = run_step(state, x, w)
    last = fetch(metrics)

    t0 = time.perf_counter()
    for it in range(iters):
        state, metrics = run_step(state, x, WARMUP + it)
    last = fetch(metrics)  # depends on every prior step's state
    dt = time.perf_counter() - t0

    assert np.isfinite(last), "non-finite loss in bench"
    imgs_per_sec = batch * scan * iters / dt
    if emit:
        print(json.dumps({
            "metric": "images_per_sec_per_chip",
            "value": round(imgs_per_sec, 1),
            "unit": "img/s",
            "vs_baseline": round(imgs_per_sec / NORTH_STAR, 4),
        }))
    return imgs_per_sec


def infer(batch=256, image_size=IMAGE_SIZE, arch="conv", iters=ITERS, pack=0):
    """Serving-path throughput: eval-mode (running-average BN) jitted
    decode (prior sample -> image) and encode (image -> mu), bf16 on TPU.

    These are the two inference surfaces a deployed model runs
    (itcvae-sample CLI / representation extraction for the metric
    families); reported separately from the train step.
    """
    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    precision_dtype = (jnp.bfloat16
                       if jax.devices()[0].platform == "tpu" else None)
    channels = {64: (64, 128, 256, 512), 128: (64, 128, 256, 512, 512),
                256: (64, 128, 256, 512, 512, 512)}[image_size]
    dataset = Synthetic(image_size=image_size, cdim=3, sizes=(4, 5, 8, 8))
    kwargs = dict(cdim=3, zdim=ZDIM, channels=channels, image_size=image_size,
                  dtype=precision_dtype)
    solver = make_solver(
        "vae", dataset=dataset,
        encoder=Encoder(arch=arch, **kwargs),
        decoder=Decoder(arch=arch, pack_predict=pack, **kwargs),
        batch_size=batch,
        optimizer_e=make_optimizer("adam", 2e-4),
        optimizer_d=make_optimizer("adam", 2e-4),
        beta_kl=0.5, beta_rec=0.75,
    )
    x = jnp.asarray(dataset.get_batch(np.arange(batch) % len(dataset)))
    state = solver.init_state(jax.random.key(0), x)

    from intro_tc_vae_tpu.solvers.base import decode, encode

    K = 10  # inference calls fused per dispatch (lax.scan) — measures the
    #         device's sustained rate, not the host/tunnel dispatch latency

    def _chained(apply_one):
        @jax.jit
        def run(inp):
            def body(carry, _):
                out = apply_one(carry)
                # thread a zero-valued dependence of the next input on this
                # output: every scan step is sequential on device and the
                # single final fetch forces the whole chain (BENCHMARKS.md).
                # The probe MUST be cast to float BEFORE the zero-mul: for
                # integer outputs (the u8 export surface) XLA folds x*0 to
                # a constant, severing the chain and measuring enqueue rate
                # (~17x overstatement observed).
                probe = out.ravel()[0].astype(jnp.float32)
                carry = carry + (0 * probe).astype(carry.dtype)
                return carry, probe
            _, probes = jax.lax.scan(body, inp, None, length=K)
            return probes.sum()
        return run

    from intro_tc_vae_tpu.solvers.base import unit_f32_to_u8

    decode_k = _chained(lambda z_: decode(
        solver.decoder, state.params["decoder"],
        state.batch_stats["decoder"], z_, train=False)[0])
    encode_k = _chained(lambda xx: encode(
        solver.encoder, state.params["encoder"],
        state.batch_stats["encoder"], xx, train=False)[0])
    # the bulk-export surface (itcvae-sample): decode + on-device uint8
    # quantization (4x fewer D2H bytes than float export)
    decode_u8_k = _chained(lambda z_: unit_f32_to_u8(decode(
        solver.decoder, state.params["decoder"],
        state.batch_stats["decoder"], z_, train=False)[0]))

    z = jax.random.normal(jax.random.key(1), (batch, ZDIM))
    rows = {}
    n_dispatch = max(1, iters // K)
    for name, fn, inp in (("decode", decode_k, z), ("encode", encode_k, x),
                          ("decode_u8", decode_u8_k, z)):
        probe = fn(inp)  # compile
        _ = float(probe)
        # one untimed dispatch of the exact timed form: the first chained
        # dispatch pays one-off costs (the chaining add's compile, buffer
        # staging) that are not steady-state throughput
        probe = probe + fn(inp + 0 * probe.astype(inp.dtype))
        _ = float(probe)
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            probe = probe + fn(inp + 0 * probe.astype(inp.dtype))
        _ = float(probe)  # forces every dispatch's K-deep chain
        rows[name] = round(batch * K * n_dispatch / (time.perf_counter() - t0), 1)
    print(json.dumps({"metric": "inference_images_per_sec_per_chip",
                      "unit": "img/s", "batch": batch,
                      "image_size": image_size, **rows}))
    return rows


def headline(full_sweep: bool = False):
    """Driver entry (no args): measure the flagship recipe (batch 64,
    paired — the batch-adaptive default) and the measured-best config
    (batch 128, unpaired — winner of the full {paired,unpaired} ×
    {64,128,256} sweep, BENCHMARKS.md round-3 table), then repeat the
    winner and report the median (VERDICT r2 weak #1/#6). A failed
    config never sinks the headline.

    The full 6-config sweep (~45 min of compiles on a cold cache) runs
    with --sweep; the default keeps the driver-facing entry within a
    ~15-minute budget while still re-validating both sides of the
    pairing crossover — plus one rotating arm of the remaining sweep
    per run (full escalation if the two fast-path configs tie within
    2%), so a moved crossover cannot silently pin the headline to a
    stale config.

    BASELINE.json's metric ("images/sec/chip at 64x64, intro_tc") does not
    pin the batch; pairing helps at small batch and hurts once the batch
    alone fills the MXU (measured crossover in BENCHMARKS.md).
    """
    all_configs = [(b, f) for f in (True, False) for b in (64, 128, 256)]
    configs = all_configs if full_sweep else [(64, True), (128, False)]
    rows: dict[str, float] = {}

    def measure(batch, fuse):
        key = f"b{batch}_{'paired' if fuse else 'unpaired'}"
        try:
            rows[key] = round(main(batch=batch, fuse=fuse, emit=False), 1)
        except Exception as e:
            print(f"{key} failed ({e!r})", flush=True)
            rows[key] = 0.0

    for batch, fuse in configs:
        measure(batch, fuse)

    if not full_sweep:
        # Self-correction (round-3 VERDICT weak #3): the fast path only
        # re-measures last round's winner configs, so a crossover moving
        # elsewhere could silently pin the driver metric to a stale config.
        # Two guards: (a) if the two fast-path configs land within 2% of
        # each other the crossover is in play — escalate to the full sweep;
        # (b) otherwise re-check ONE rotating arm of the remaining sweep per
        # invocation (persistent counter), so every config is re-validated
        # every 4 runs without paying the full-sweep compile budget.
        vals = sorted(rows.values(), reverse=True)
        rest = [c for c in all_configs if c not in configs]
        if vals[0] > 0 and (vals[0] - vals[1]) / vals[0] < 0.02:
            print("fast-path configs within 2%: crossover in play, "
                  "escalating to the full sweep", flush=True)
            for batch, fuse in rest:
                measure(batch, fuse)
        else:
            arm_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    ".bench_arm")
            try:
                idx = int(open(arm_file).read().strip())
            except (OSError, ValueError):
                idx = 0
            batch, fuse = rest[idx % len(rest)]
            try:
                with open(arm_file, "w") as f:
                    f.write(str(idx + 1))
            except OSError:
                pass  # read-only checkout: rotation just restarts at arm 0
            print(f"rotating sweep arm {idx % len(rest)}: "
                  f"b{batch}_{'paired' if fuse else 'unpaired'}", flush=True)
            measure(batch, fuse)

    best_key = max(rows, key=rows.get)  # type: ignore[arg-type]
    best_batch = int(best_key.split("_")[0][1:])
    best_fuse = best_key.endswith("_paired")
    repeats = [rows[best_key]]
    for _ in range(2):
        try:
            repeats.append(round(main(batch=best_batch, fuse=best_fuse,
                                      emit=False), 1))
        except Exception as e:
            print(f"repeat of {best_key} failed ({e!r})", flush=True)
    value = float(np.median(repeats))
    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "img/s",
        "vs_baseline": round(value / NORTH_STAR, 4),
        "batch": best_batch,
        "fuse_passes": best_fuse,
        "repeats": repeats,
        "batch64_flagship": rows.get("b64_paired", 0.0),
        **rows,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = headline mode (batch 64 + 128, best wins)")
    ap.add_argument("--image-size", type=int, default=IMAGE_SIZE)
    ap.add_argument("--arch", default="conv")
    ap.add_argument("--solver", default="intro_tc")
    ap.add_argument("--tc-impl", default="xla")
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--scan", type=int, default=1,
                    help="fuse K steps per dispatch (lax.scan)")
    ap.add_argument("--pack", type=int, default=0,
                    help="decoder pack_predict block size (0 = plain conv)")
    ap.add_argument("--conv-impl", default="xla",
                    help="3x3 conv impl: xla | pallas (ops/conv_pallas.py)")
    ap.add_argument("--tile", type=int, default=0,
                    help="strip-tile convs at >=2x this input height "
                         "(models/blocks.py::StripTiledConv; 0 = off)")
    ap.add_argument("--remat", nargs="?", const="block", default=False,
                    choices=["block", "pass"],
                    help="activation remat: 'block' = per conv block; "
                         "'pass' = whole encode/decode passes of the intro "
                         "step (the bigger memory lever for large batches)")
    ap.add_argument("--no-fuse", action="store_true",
                    help="disable paired-pass fusion (solvers/intro.py)")
    ap.add_argument("--tb", action="store_true",
                    help="bench the full train_step with a live TensorBoard "
                         "writer (ring-buffered scalar fetches)")
    ap.add_argument("--sweep", action="store_true",
                    help="headline mode with the full {paired,unpaired} x "
                         "{64,128,256} sweep instead of the 2-config fast path")
    ap.add_argument("--infer", action="store_true",
                    help="serving-path bench: eval-mode jitted decode/encode "
                         "throughput (uses --batch, default 256)")
    a = ap.parse_args()
    if a.infer:
        infer(batch=a.batch or 256, image_size=a.image_size, arch=a.arch,
              iters=a.iters, pack=a.pack)
    elif a.batch == 0:
        headline(full_sweep=a.sweep)
    else:
        main(a.batch, a.image_size, a.arch, a.solver, a.tc_impl, a.iters,
             a.scan, fuse=not a.no_fuse, tb=a.tb, pack=a.pack, tile=a.tile,
             conv_impl=a.conv_impl,
             remat=a.remat)
