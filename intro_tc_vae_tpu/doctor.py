"""``itcvae-doctor``: preflight a real-data training run.

Validates everything the reference's loaders assume at load time
(reference dataset.py:40-129 dSprites npz, :131-162 MPI3D npz,
:207-288 Ukiyo-E CSV + image dir) plus the FID inception weights layout
and device memory vs the config — and prints the exact fix for each
failure — BEFORE a user commits to a 250-epoch run.

Usage mirrors the train CLI's -f/-u contract::

    itcvae-doctor -f config.json -u '{"dataset": "ukiyo_e256", ...}'
    itcvae-doctor -u '{"dataset": "dsprites", "data_root": "/data"}' \
        --inception-weights /path/pt_inception-2015-12-05.pth

Exit code 0 = every check passed (or was skipped as not applicable);
1 = at least one FAIL.
"""

from __future__ import annotations

import argparse
import json
import os
import zipfile
from typing import Iterator, Tuple

import numpy as np

# npz archives the loaders open, with the keys/shapes they index
# (reference dataset.py:56-57 ["imgs"]*255 / ["latents_values"];
# :136 ["images"]). Row counts are the full public corpora.
_DSPRITES_FILE = "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz"
_MPI3D_FILE = "mpi3d_toy.npz"
_UKIYOE_CSV = "arc_extracted_face_metadata.csv"
_UKIYOE_DIR = "arc_extracted_face_images"


class _Report:
    """Collects PASS/WARN/FAIL lines; FAILs flip the exit code."""

    def __init__(self) -> None:
        self.failed = False

    def ok(self, check: str, detail: str = "") -> None:
        print(f"  PASS  {check}" + (f" — {detail}" if detail else ""))

    def warn(self, check: str, detail: str, fix: str = "") -> None:
        print(f"  WARN  {check} — {detail}")
        if fix:
            print(f"        fix: {fix}")

    def fail(self, check: str, detail: str, fix: str) -> None:
        self.failed = True
        print(f"  FAIL  {check} — {detail}")
        print(f"        fix: {fix}")

    def skip(self, check: str, why: str) -> None:
        print(f"  skip  {check} ({why})")


def _npz_headers(path: str) -> Iterator[Tuple[str, tuple, np.dtype]]:
    """(key, shape, dtype) for each array in an npz WITHOUT materializing
    the data — reads only each member's .npy header, so a 3 GB corpus
    costs milliseconds to validate."""
    from numpy.lib import format as npfmt

    with zipfile.ZipFile(path) as zf:
        for name in zf.namelist():
            if not name.endswith(".npy"):
                continue
            with zf.open(name) as f:
                version = npfmt.read_magic(f)
                shape, _fortran, dtype = npfmt._read_array_header(f, version)
                yield name[:-4], shape, dtype


def _check_npz(rep: _Report, path: str, want: dict, expected_rows: int,
               corpus: str) -> None:
    if not os.path.exists(path):
        rep.fail(
            f"{corpus} archive", f"{path} not found",
            f"download {os.path.basename(path)} into data_root "
            "(or pass --data-root / config.data_root)",
        )
        return
    try:
        headers = {k: (shape, dtype) for k, shape, dtype in _npz_headers(path)}
    except (zipfile.BadZipFile, ValueError) as e:
        rep.fail(f"{corpus} archive", f"unreadable npz: {e!r}",
                 "re-download the archive; it is corrupt or not an npz")
        return
    for key, ndim in want.items():
        if key not in headers:
            rep.fail(
                f"{corpus} key '{key}'",
                f"missing (has: {sorted(headers)})",
                f"the loader indexes arr[{key!r}] — wrong or repacked archive",
            )
            return
        shape, dtype = headers[key]
        if len(shape) not in ndim:
            rep.fail(
                f"{corpus} key '{key}'",
                f"shape {shape} has ndim {len(shape)}, expected {sorted(ndim)}",
                "wrong archive variant (e.g. the *_complex or tfrecord repack)",
            )
            return
    rows = headers[next(iter(want))][0][0]
    if rows != expected_rows:
        rep.warn(
            f"{corpus} row count", f"{rows:,} rows (full corpus has "
            f"{expected_rows:,})",
            "fine if this is a deliberate subset; factor grids assume the "
            "full cartesian product for the disentanglement metrics",
        )
    else:
        rep.ok(f"{corpus} archive", f"{rows:,} rows, keys/shapes match the loader")


def _check_dataset(rep: _Report, name: str, data_root: str | None) -> None:
    print(f"[dataset: {name}]")
    if name.startswith("synthetic"):
        rep.ok("synthetic dataset", "procedural, no files needed")
        return
    root = data_root or "."
    if name.startswith("dsprites"):
        _check_npz(rep, os.path.join(root, _DSPRITES_FILE),
                   {"imgs": {3}, "latents_values": {2}}, 737280, "dSprites")
    elif name.startswith("mpi3d"):
        _check_npz(rep, os.path.join(root, _MPI3D_FILE),
                   {"images": {4}}, 1036800, "MPI3D")
    elif name.startswith("ukiyo_e"):
        _check_ukiyoe(rep, root)
    else:
        rep.fail("dataset name", f"unknown dataset '{name}'",
                 "one of: ukiyo_e{64,128,256}, dsprites[_small], "
                 "mpi3d[_small], synthetic*")


def _check_ukiyoe(rep: _Report, root: str) -> None:
    from intro_tc_vae_tpu.data.datasets import UkiyoE

    csv_path = os.path.join(root, _UKIYOE_CSV)
    img_dir = os.path.join(root, _UKIYOE_DIR)
    if not os.path.exists(csv_path):
        rep.fail("Ukiyo-E metadata", f"{csv_path} not found",
                 f"place {_UKIYOE_CSV} in data_root (ARC face-crop release)")
        return
    try:
        df = UkiyoE.load_labels(root)
    except Exception as e:
        rep.fail("Ukiyo-E metadata", f"CSV unparseable: {e!r}",
                 f"the CSV must have >= {len(UkiyoE.COLUMN_NAMES)} columns "
                 "(renamed positionally); re-download the metadata file")
        return
    rep.ok("Ukiyo-E metadata", f"{len(df):,} rows, columns parse")
    if not os.path.isdir(img_dir):
        rep.fail("Ukiyo-E images", f"{img_dir}/ not found",
                 f"extract the face-crop images into {_UKIYOE_DIR}/")
        return
    name_col = ("singleface_filename" if "singleface_filename" in df.columns
                else "filename")
    names = df[name_col].astype(str)
    on_disk = int(sum(os.path.exists(os.path.join(img_dir, n)) for n in names))
    if on_disk == 0:
        rep.fail(
            "Ukiyo-E images",
            f"0 of {len(names):,} CSV '{name_col}' entries exist in {img_dir}",
            "image filenames must match the CSV column; check the extraction "
            "directory layout (files directly inside, no subfolders)",
        )
    elif on_disk < len(names):
        rep.warn(
            "Ukiyo-E images",
            f"{on_disk:,}/{len(names):,} CSV entries found on disk "
            "(missing files are skipped, matching the reference loader)",
            "",
        )
    else:
        rep.ok("Ukiyo-E images", f"all {on_disk:,} CSV entries on disk")
    # decode one image through the exact load pipeline
    for n in names:
        p = os.path.join(img_dir, n)
        if os.path.exists(p):
            try:
                from PIL import Image

                with Image.open(p) as im:
                    im.convert("RGB").resize((256, 256), Image.BICUBIC)
                rep.ok("Ukiyo-E decode probe", f"{n} decodes + resizes")
            except Exception as e:
                rep.fail("Ukiyo-E decode probe", f"{n}: {e!r}",
                         "corrupt image or unsupported format; re-extract")
            break


def _check_inception(rep: _Report, weights_path: str | None,
                     need_fid: bool) -> None:
    print("[inception weights (FID / encoder-FID)]")
    from intro_tc_vae_tpu.models.inception import (
        WEIGHTS_ENV,
        find_weights,
        load_torch_inception_weights,
    )

    path = find_weights(weights_path)
    if path is None:
        (rep.fail if need_fid else rep.warn)(
            "weights file",
            "no inception weights found (FID scores unavailable)",
            f"set ${WEIGHTS_ENV} or pass --inception-weights; accepts the "
            "pytorch-fid pt_inception-2015-12-05 .pth or a torchvision "
            "inception_v3 state_dict",
        )
        return
    try:
        params, stats = load_torch_inception_weights(path)
    except Exception as e:
        rep.fail("weights file", f"{path}: torch load/convert failed: {e!r}",
                 "the file must be a torch state_dict (.pth); re-download")
        return
    # structural parity: converted tree must match the flax model's init
    # tree exactly (names AND shapes) — this is the same table the
    # transplant importer fills, so a pass here means FID will run
    import jax
    import jax.numpy as jnp

    from intro_tc_vae_tpu.models.inception import InceptionV3Features

    model = InceptionV3Features()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))
    )
    want_p = {tuple(p): v.shape for p, v in
              jax.tree_util.tree_flatten_with_path(ref["params"])[0]}
    got_p = {tuple(p): np.shape(v) for p, v in
             jax.tree_util.tree_flatten_with_path(params)[0]}
    missing = sorted(set(map(str, want_p)) - set(map(str, got_p)))
    extra = sorted(set(map(str, got_p)) - set(map(str, want_p)))
    bad_shapes = [
        f"{k}: got {got_p[k]}, want {want_p[k]}"
        for k in want_p if k in got_p and tuple(got_p[k]) != tuple(want_p[k])
    ]
    if missing or extra or bad_shapes:
        detail = "; ".join(
            ([f"{len(missing)} missing params (e.g. {missing[0]})"] if missing else [])
            + ([f"{len(extra)} unexpected params (e.g. {extra[0]})"] if extra else [])
            + bad_shapes[:3]
        )
        rep.fail("weights structure", detail,
                 "not an inception_v3 checkpoint of the expected variant; use "
                 "pt_inception-2015-12-05.pth (pytorch-fid) or torchvision's "
                 "inception_v3 weights")
    else:
        rep.ok("weights structure",
               f"{path}: all {len(want_p)} param tensors present, shapes match")


def _check_device(rep: _Report, config) -> None:
    print("[device memory vs config]")
    import jax

    try:
        dev = jax.devices()[0]
    except Exception as e:
        rep.fail("device", f"jax.devices() failed: {e!r}",
                 "check the TPU runtime / JAX_PLATFORMS")
        return
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    limit = stats.get("bytes_limit")
    if not limit:
        # some runtimes (e.g. tunneled plugins) expose no memory_stats;
        # fall back to the known HBM capacity per device kind
        known_gib = {"v5 lite": 16, "v5e": 16, "v5p": 95, "v4": 32,
                     "v6 lite": 32, "v6e": 32, "v3": 16, "v2": 8}
        kind = dev.device_kind.lower()
        for k, gib in known_gib.items():
            if k in kind:
                limit = gib * 2**30
                break
    if not limit:
        rep.skip("memory estimate", f"{dev.device_kind}: no memory_stats")
        return
    # coarse activation-footprint estimate for the intro two-phase step:
    # per-pass conv-stack activations (NHWC fp32/bf16, spatial halving per
    # block, x2 for conv+BN intermediates), ~7 live passes unpaired / the
    # same tensors grouped when paired, x1 extra copy for grads. This is a
    # ballpark (XLA fusion changes the real number); it flags configs that
    # are far over budget, and the remat knobs are the documented fix
    # (BENCHMARKS.md: 256px b128 plain OOMs 16 GB, remat='pass' fits).
    sizes = {"ukiyo_e256": 256, "ukiyo_e128": 128, "synthetic256": 256,
             "synthetic128": 128}
    img = sizes.get(config.dataset, 64)
    chans = {64: (64, 128, 256, 512), 128: (64, 128, 256, 512, 512),
             256: (64, 128, 256, 512, 512, 512)}[img]
    bpe = 2 if config.precision == "bf16" else 4
    per_pass = 0
    h = img
    for c in chans:
        per_pass += h * h * c * 2  # conv out + BN intermediate
        h //= 2
    passes = 2 if config.remat == "pass" else 7
    est = config.batch_size * per_pass * bpe * passes * 2  # x2 grads
    frac = est / limit
    gb = est / 2**30
    if frac > 1.0:
        rep.fail(
            "activation memory",
            f"~{gb:.1f} GiB estimated vs {limit / 2**30:.1f} GiB on "
            f"{dev.device_kind} (batch {config.batch_size}, {img}px, "
            f"{config.precision})",
            'set "remat": "pass" (intro solvers) or "block", lower '
            "batch_size, or use precision='bf16'",
        )
    elif frac > 0.7:
        rep.warn(
            "activation memory",
            f"~{gb:.1f} GiB estimated vs {limit / 2**30:.1f} GiB — tight",
            'consider "remat": "pass" or bf16 if the run OOMs',
        )
    else:
        rep.ok("activation memory",
               f"~{gb:.1f} GiB estimated vs {limit / 2**30:.1f} GiB on "
               f"{dev.device_kind}")


def _check_dirs(rep: _Report, config) -> None:
    print("[output dirs]")
    for label, d in (("checkpoint_dir", config.checkpoint_dir),
                     ("log_dir", config.log_dir)):
        if not d:
            rep.skip(label, "unset, defaults apply")
            continue
        try:
            os.makedirs(d, exist_ok=True)
            probe = os.path.join(d, ".itcvae_doctor_probe")
            with open(probe, "w") as f:
                f.write("ok")
            os.remove(probe)
            rep.ok(label, f"{d} writable")
        except OSError as e:
            rep.fail(label, f"{d} not writable: {e!r}",
                     "create the directory or point the config elsewhere")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="preflight a training config: corpus layout, inception "
        "weights, device memory, output dirs")
    ap.add_argument("-f", "--config", type=str, default=None,
                    help="Path to the JSON config file (same as itcvae-train)")
    ap.add_argument("-u", "--update", type=json.loads, default="{}",
                    help="Inline JSON dict overriding config values")
    ap.add_argument("--inception-weights", default=None,
                    help="explicit path to inception .pth (else env/default)")
    ap.add_argument("--fid", action="store_true",
                    help="treat missing inception weights as FAIL, not WARN")
    args = ap.parse_args(argv)

    rep = _Report()
    print("[config]")
    try:
        from intro_tc_vae_tpu.config import load_config

        config = load_config(args.config, update_dict=args.update)
        rep.ok("config", f"solver={config.solver} dataset={config.dataset} "
               f"batch={config.batch_size}")
    except (ValueError, FileNotFoundError) as e:
        rep.fail("config", str(e), "fix the config file / -u overrides")
        print("\nresult: FAIL (config unusable, further checks skipped)")
        return 1

    _check_dataset(rep, config.dataset, config.data_root)
    _check_inception(rep, args.inception_weights, args.fid)
    _check_device(rep, config)
    _check_dirs(rep, config)

    print(f"\nresult: {'FAIL' if rep.failed else 'PASS'}")
    return 1 if rep.failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
