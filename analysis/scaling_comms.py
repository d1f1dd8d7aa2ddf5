"""Cross-chip traffic audit: what the compiled train step actually moves.

For each parallelism phase (DP8, TP2xDP4, DP8 + sharded-TC) this compiles
the FULL intro_tc train step over a virtual 8-device mesh (same recipe as
__graft_entry__.dryrun_multichip / tests/conftest.py) and parses the
optimized HLO for collective ops — the ground truth of what GSPMD will put
on the ICI per step, measured from the compiler's output rather than
asserted from theory. Reference scaling surface: the reference is
single-device torch (SURVEY §2.9); this audits the TPU-native design.

Usage:
    python analysis/scaling_comms.py            # flagship shapes, 8 devices
    python analysis/scaling_comms.py --tiny     # CI-sized shapes

Writes docs/scaling_comms.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

# one shape token inside an HLO op result, e.g. f32[64,128]{1,0}
_SHAPE_RE = re.compile(r"(\w+?)\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def audit_hlo_text(txt: str) -> dict:
    """Count collective ops and their payload bytes in optimized HLO.

    Async pairs are counted once via the `-done` line, whose result shape
    IS the collective's payload (a `-start`'s tuple also aliases the
    operand buffers and context scratch, which would double-count); plain
    sync forms are counted via the op name itself. `ROOT %op = ...` lines
    are matched too (collectives can be computation roots). For
    tuple-shaped fused collectives, every element of the tuple counts.
    """
    out = {k: {"count": 0, "bytes": 0} for k in _COLLECTIVES}
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*"
                     r"(\([^)]*\)|[\w\[\]{},: ]+?)\s+([\w\-]+)\(", line)
        if not m:
            continue
        result_shapes, op = m.groups()
        kind = None
        for c in _COLLECTIVES:
            if op == c or op == c + "-done":
                kind = c
                break
        if kind is None:
            continue
        nbytes = sum(_shape_bytes(d, dims)
                     for d, dims in _SHAPE_RE.findall(result_shapes))
        out[kind]["count"] += 1
        out[kind]["bytes"] += nbytes
    out["total_bytes"] = sum(v["bytes"] for k, v in out.items()
                             if isinstance(v, dict))
    return out


def _run_child(n_devices: int, tiny: bool, phases: tuple = None) -> dict:
    """Re-exec under a clean CPU platform with n virtual devices."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    code = (f"import sys; sys.path.insert(0, {REPO!r}); "
            f"from analysis.scaling_comms import _child_main; "
            f"_child_main({n_devices}, {tiny}, {phases!r})")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"comms child failed:\n{proc.stderr[-4000:]}")
    return json.loads(proc.stdout.splitlines()[-1])


def _child_main(n_devices: int, tiny: bool, phases: tuple = None) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from intro_tc_vae_tpu.parallel import batch_sharding, make_mesh, shard_state

    if tiny:
        shapes = dict(image_size=32, channels=(16, 32), zdim=16)
        batch = 2 * n_devices
    else:  # flagship recipe shapes (reference README.md:24-26)
        shapes = dict(image_size=64, channels=(64, 128, 256, 512), zdim=128)
        batch = 64

    def compile_phase(mesh, tc_impl="xla", min_dim=None):
        solver, dataset = ge._build_solver(mesh=mesh, batch=batch,
                                           tc_impl=tc_impl, **shapes)
        x = jax.device_put(
            jnp.asarray(dataset.get_batch(np.arange(batch) % len(dataset))),
            batch_sharding(mesh),
        )
        state = solver.init_state(jax.random.key(0), x)
        kw = {"min_dim": min_dim} if min_dim else {}
        state = shard_state(state, mesh, **kw)
        compiled = solver._step_fn.lower(state, x).compile()
        param_bytes = sum(
            a.size * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(state.params)
        )
        return compiled.as_text(), param_bytes

    results = {}
    all_phases = [("dp8", make_mesh(n_devices), "xla", None),
                  ("dp8_sharded_tc", make_mesh(n_devices), "blockwise", None),
                  ("tp2_dp4", make_mesh(n_devices, model_parallel=2), "xla", 8)]
    if phases:
        all_phases = [p for p in all_phases if p[0] in phases]
    for name, mesh, tc_impl, min_dim in all_phases:
        txt, param_bytes = compile_phase(mesh, tc_impl, min_dim)
        results[name] = audit_hlo_text(txt)
        results[name]["param_bytes"] = param_bytes
    results["meta"] = dict(n_devices=n_devices, batch=batch, **{
        k: (list(v) if isinstance(v, tuple) else v) for k, v in shapes.items()
    })
    print(json.dumps(results))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CI-sized model instead of flagship shapes")
    ap.add_argument("--devices", type=int, default=8)
    a = ap.parse_args()

    results = _run_child(a.devices, a.tiny)
    out = os.path.join(REPO, "docs", "scaling_comms.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)

    meta = results.pop("meta")
    print(f"# per-step collective traffic, {meta['n_devices']}-device mesh, "
          f"batch {meta['batch']}, {meta['image_size']}px "
          f"channels {meta['channels']} (compiled-HLO audit)\n")
    print("| phase | all-reduce | all-gather | reduce-scatter | "
          "perm/a2a | total MB | params MB |")
    print("|---|---|---|---|---|---|---|")
    for name, r in results.items():
        def cell(k):
            return f"{r[k]['count']}x / {r[k]['bytes'] / 1e6:.2f} MB"
        pa = (r["collective-permute"]["count"] + r["all-to-all"]["count"])
        print(f"| {name} | {cell('all-reduce')} | {cell('all-gather')} | "
              f"{cell('reduce-scatter')} | {pa}x | "
              f"{r['total_bytes'] / 1e6:.2f} | {r['param_bytes'] / 1e6:.2f} |")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
