"""Train-STEP-level parity vs the reference solver implementations.

Runs the reference's actual solver classes (torch, lr=0 so parameters
don't move) against our jitted steps on the SAME transplanted weights and
batch, with randomness disabled on both sides (noise = 0, z = mu), and
compares every loss the step produces: lossE, lossD, kl, rec, expELBO.

This is the strongest parity statement available without bit-matching two
different PRNGs: identical solver math on identical state.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")

B, ZDIM, IMG, N = 8, 16, 32, 4000
BETAS = dict(beta_rec=0.75, beta_kl=0.5)
INTRO = dict(beta_neg=64.0, gamma_r=1e-8)


class _PlainDataset:
    """len() provider for the TC dataset_size; not factor-structured."""

    def __len__(self):
        return N


@pytest.fixture(scope="module")
def ref_mods():
    import torch  # noqa: F401

    # Stub reference-only imports missing in this env (quirk Q6 and the
    # xgboost/torchvision dependencies of its evaluation/data modules —
    # none are exercised by the solver math under test). Stubs are
    # removed at teardown so later tests see the real import errors.
    stubbed: list[str] = []

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        stubbed.append(name)
        return m

    stub("black", out=None)
    stub("xgboost", XGBClassifier=object)
    tv = stub("torchvision")
    tv.transforms = stub(
        "torchvision.transforms", Compose=object, ToTensor=object,
        RandomHorizontalFlip=object,
    )
    tv.io = stub("torchvision.io", read_image=None)
    tv.utils = stub("torchvision.utils", make_grid=None, save_image=None)
    tv.__path__ = []  # mark as package so 'torchvision.utils' resolves
    sys.modules["torchvision.transforms.functional"] = stub(
        "torchvision.transforms.functional", resize=None
    )
    tv.transforms.functional = sys.modules["torchvision.transforms.functional"]
    sys.path.insert(0, REF)
    try:
        import models as ref_models
        import ops as ref_ops
        import solvers.intro as ref_intro
        import solvers.intro_tc as ref_intro_tc
        import solvers.tc as ref_tc
        import solvers.vae as ref_vae
        import utils as ref_utils

        sw = ref_utils.SingletonWriter()
        sw.writer, sw.cur_iter, sw.test_iter = None, 0, 10**9
    finally:
        sys.path.remove(REF)
    yield types.SimpleNamespace(
        models=ref_models, ops=ref_ops, vae=ref_vae, tc=ref_tc,
        intro=ref_intro, intro_tc=ref_intro_tc,
    )
    for name in stubbed:  # don't leak stubs into later tests
        sys.modules.pop(name, None)


def _patch_ref_determinism(monkeypatch, ref_mods):
    """Reference side: z = mu, noise = 0."""
    import torch

    monkeypatch.setattr(ref_mods.models, "reparameterize", lambda mu, lv: mu)
    monkeypatch.setattr(ref_mods.intro, "reparameterize", lambda mu, lv: mu,
                        raising=False)
    real_randn = torch.randn

    def zeros_randn(*args, **kwargs):
        return torch.zeros(*args, **kwargs) if "size" not in kwargs else \
            torch.zeros(kwargs["size"])

    monkeypatch.setattr(torch, "randn", zeros_randn)
    return real_randn


def _patch_our_determinism(monkeypatch):
    """Our side: jax.random.normal -> zeros (z = mu + 0*std, noise = 0)."""
    import jax
    import jax.numpy as jnp

    real_normal = jax.random.normal

    def zeros_normal(key, shape=None, dtype=jnp.float32):
        return jnp.zeros(shape if shape is not None else (), dtype)

    monkeypatch.setattr(jax.random, "normal", zeros_normal)
    return real_normal


def _make_ref_solver(ref_mods, solver_name):
    import torch

    torch.manual_seed(0)
    model = ref_mods.models.SoftIntroVAE(
        arch="res", cdim=3, zdim=ZDIM, channels=[8, 16], image_size=IMG
    )
    model.train()
    opt_e = torch.optim.SGD(model.encoder.parameters(), lr=0.0)
    opt_d = torch.optim.SGD(model.decoder.parameters(), lr=0.0)
    kwargs = dict(
        dataset=_PlainDataset(), model=model, batch_size=B,
        optimizer_e=opt_e, optimizer_d=opt_d, recon_loss_type="mse",
        device=torch.device("cpu"), use_amp=False, grad_scaler=None,
        writer=None, clip=1e9,  # huge no-op clip: avoids quirk Q3 NameError
        **BETAS,
    )
    cls = {"vae": ref_mods.vae.VAESolver, "tc": ref_mods.tc.TCSovler,
           "intro": ref_mods.intro.IntroSolver,
           "intro_tc": ref_mods.intro_tc.IntroTCSovler}[solver_name]
    if solver_name in ("intro", "intro_tc"):
        kwargs.update(INTRO)
    return cls(**kwargs), model


def _make_our_solver(solver_name, tmodel):
    import jax
    import jax.numpy as jnp
    import optax

    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.models.vae import conv_output_size
    from intro_tc_vae_tpu.solvers import make_solver
    from intro_tc_vae_tpu.utils.transplant import torch_state_dict_to_flax

    kwargs = dict(cdim=3, zdim=ZDIM, channels=(8, 16), image_size=IMG)
    solver = make_solver(
        solver_name,
        dataset=_PlainDataset(),
        encoder=Encoder(arch="res", **kwargs),
        decoder=Decoder(arch="res", **kwargs),
        batch_size=B,
        optimizer_e=optax.sgd(0.0),
        optimizer_d=optax.sgd(0.0),
        recon_loss_type="mse",
        clip=1e9,
        **BETAS,
        **INTRO,
    )
    params, stats = torch_state_dict_to_flax(
        tmodel.state_dict(), "res", conv_output_size(IMG, (8, 16))
    )
    base = solver.init_state(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    params = jax.tree_util.tree_map(
        lambda ref, new: jnp.asarray(new, ref.dtype),
        base.params, {"encoder": params["encoder"], "decoder": params["decoder"]},
    )
    state = base.replace(params=params, batch_stats=stats)
    return solver, state


@pytest.mark.parametrize("solver_name", ["vae", "tc", "intro", "intro_tc"])
def test_step_losses_match_reference(monkeypatch, ref_mods, solver_name, rng):
    import torch

    import jax.numpy as jnp

    _patch_ref_determinism(monkeypatch, ref_mods)
    _patch_our_determinism(monkeypatch)

    ref_solver, tmodel = _make_ref_solver(ref_mods, solver_name)
    our_solver, state = _make_our_solver(solver_name, tmodel)

    x = rng.rand(B, 3, IMG, IMG).astype(np.float32)
    ref_out = ref_solver.train_step(torch.from_numpy(x), cur_iter=1)

    batch = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    _, metrics = our_solver._step_fn(state, batch)

    for ref_key, our_key in (("loss_enc", "loss_enc"), ("loss_dec", "loss_dec"),
                             ("loss_kl", "loss_kl"), ("loss_rec", "loss_rec")):
        a, b = float(ref_out[ref_key]), float(metrics[our_key])
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=1e-4,
            err_msg=f"{solver_name}.{ref_key}: ours={b} ref={a}",
        )
