"""End-to-end numerical parity vs the torch reference implementation.

Transplants the reference model's weights into our flax model and checks
that encoder moments, decoder outputs, and full solver loss values agree
to fp32 tolerance on the same inputs — the loss-parity surface BASELINE.md
names. Requires /root/reference (skipped elsewhere).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")

MODEL_KW = dict(cdim=3, zdim=16, channels=(8, 16), image_size=32)


@pytest.fixture(scope="module")
def ref_modules():
    import torch  # noqa: F401

    if "black" not in sys.modules:  # reference quirk Q6
        stub = types.ModuleType("black")
        stub.out = None
        sys.modules["black"] = stub
    sys.path.insert(0, REF)
    try:
        import models as ref_models
        import ops as ref_ops
    finally:
        sys.path.remove(REF)
    return ref_models, ref_ops


def make_pair(ref_modules, arch):
    """(torch model, our model, our transplanted variables)."""
    import torch

    import jax
    from intro_tc_vae_tpu.models import SoftIntroVAE
    from intro_tc_vae_tpu.models.vae import conv_output_size
    from intro_tc_vae_tpu.utils.transplant import torch_state_dict_to_flax

    ref_models, _ = ref_modules
    torch.manual_seed(0)
    tmodel = ref_models.SoftIntroVAE(
        arch=arch, cdim=3, zdim=16, channels=[8, 16], image_size=32
    )
    tmodel.eval()

    jmodel = SoftIntroVAE(arch=arch, **MODEL_KW)
    cos = conv_output_size(32, (8, 16))
    params, stats = torch_state_dict_to_flax(tmodel.state_dict(), arch, cos)
    variables = {"params": params, "batch_stats": stats}

    # structure check against a fresh init
    init_vars = jmodel.init(
        {"params": jax.random.key(0), "reparam": jax.random.key(1)},
        np.zeros((1, 32, 32, 3), np.float32),
    )
    ref_paths = jax.tree_util.tree_structure(init_vars["params"])
    got_paths = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, params)
    )
    assert ref_paths == got_paths, f"params structure mismatch for {arch}"
    return tmodel, jmodel, variables


@pytest.mark.parametrize("arch", ["conv", "res", "inception"])
def test_forward_parity(ref_modules, arch, rng):
    import torch

    import jax.numpy as jnp

    tmodel, jmodel, variables = make_pair(ref_modules, arch)
    x = rng.rand(4, 3, 32, 32).astype(np.float32)  # NCHW for torch

    with torch.no_grad():
        tmu, tlogvar = tmodel.encode(torch.from_numpy(x))
        trec = tmodel.decode(tmu)

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    (jmu, jlogvar) = jmodel.apply(variables, x_nhwc, False,
                                  method=type(jmodel).encode)
    jrec = jmodel.apply(variables, jmu, False, method=type(jmodel).decode)

    np.testing.assert_allclose(np.asarray(jmu), tmu.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jlogvar), tlogvar.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jrec), np.transpose(trec.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("arch", ["res"])
def test_train_mode_bn_forward_parity(ref_modules, arch, rng):
    """Train-mode BN (batch statistics) must also agree — the solvers run
    ~11 train-mode forwards per intro step."""
    import torch

    import jax.numpy as jnp

    tmodel, jmodel, variables = make_pair(ref_modules, arch)
    tmodel.train()
    x = rng.rand(8, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        tmu, tlogvar = tmodel.encode(torch.from_numpy(x))

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    (jmu, jlogvar), _ = jmodel.apply(
        variables, x_nhwc, True, mutable=["batch_stats"],
        method=type(jmodel).encode,
    )
    np.testing.assert_allclose(np.asarray(jmu), tmu.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jlogvar), tlogvar.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_loss_value_parity(ref_modules, rng):
    """Deterministic (z = mu) ELBO + TC loss values match the reference's
    solver math end-to-end on the same weights and inputs."""
    import torch

    import jax.numpy as jnp
    from intro_tc_vae_tpu import ops as jops

    ref_models, ref_ops = ref_modules
    tmodel, jmodel, variables = make_pair(ref_modules, "res")
    x = rng.rand(8, 3, 32, 32).astype(np.float32)
    scale = 1.0 / (3 * 32 * 32)
    beta_rec, beta_kl, n = 0.75, 0.5, 4000

    with torch.no_grad():
        tmu, tlogvar = tmodel.encode(torch.from_numpy(x))
        trec = tmodel.decode(tmu)
        t_rec_loss = ref_ops.reconstruction_loss(
            torch.from_numpy(x), trec, "mse", "mean"
        )
        t_kl = ref_ops.kl_divergence(tlogvar, tmu, reduce="mean")
        t_tc = ref_ops.total_correlation(tmu, tmu, tlogvar, n)
        t_loss = scale * (beta_rec * t_rec_loss + beta_kl * t_kl)

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    jmu, jlogvar = jmodel.apply(variables, x_nhwc, False,
                                method=type(jmodel).encode)
    jrec = jmodel.apply(variables, jmu, False, method=type(jmodel).decode)
    j_rec_loss = jops.reconstruction_loss(x_nhwc, jrec, "mse", "mean")
    j_kl = jops.kl_divergence(jlogvar, jmu, reduce="mean")
    j_tc = jops.total_correlation(jmu, jmu, jlogvar, n)
    j_loss = scale * (beta_rec * j_rec_loss + beta_kl * j_kl)

    np.testing.assert_allclose(float(j_rec_loss), float(t_rec_loss), rtol=1e-4)
    np.testing.assert_allclose(float(j_kl), float(t_kl), rtol=1e-4)
    np.testing.assert_allclose(float(j_tc), float(t_tc), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-4)
