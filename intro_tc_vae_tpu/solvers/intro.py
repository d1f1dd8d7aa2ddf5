"""Soft-Intro two-phase adversarial train step as ONE jitted function.

Redesign of reference solvers/intro.py:56-196. The torch version freezes
parameter sets by flipping ``requires_grad`` between two backwards
(intro.py:66-69, 119-122); here each phase is a ``jax.value_and_grad``
over only its own parameter subtree — the other subtree enters the loss
as a non-differentiated closure constant, which is the functional
equivalent of frozen parameters (gradients still flow *through* the
frozen network's activations, as in torch).

BatchNorm running stats update on every forward in train mode — including
the detached/fake passes — in the reference's exact execution order:

  phase E: dec(noise), enc(real), dec(z), enc(rec'), dec(z_rec),
           enc(fake'), dec(z_fake)
  phase D: dec(noise), dec(z'), enc(rec), enc(fake), dec(z_rec'),
           dec(z_fake')

(' = stop_gradient). Stats are threaded sequentially through the phases.

expELBO numerics: exp(-2*scale*(rec + beta_neg*kl)) underflows to 0 for
bad samples (by design); computed in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intro_tc_vae_tpu import ops
from intro_tc_vae_tpu.solvers.base import (
    SolverHyper,
    TrainState,
    VAESolver,
    clip_by_global_norm,
    decode,
    encode,
    global_norm,
    kl_term,
    rec_term,
    tc_decomp_metrics,
)

sg = jax.lax.stop_gradient


def build_intro_step(h: SolverHyper, encoder, decoder, opt_e, opt_d,
                     paired: bool = True, remat_passes: bool = False):
    """Build the jitted two-phase (state, batch) -> (state, metrics) step.

    paired=True batches each phase's independent same-network passes into
    one call of twice the batch — phase E becomes enc(real) ->
    dec([noise; z]) -> enc([rec'; fake']) -> dec([z_rec; z_fake]), phase D
    becomes dec([noise; z']) -> enc([rec; fake]) -> dec([z_rec'; z_fake'])
    — with per-group BatchNorm statistics (GroupedBatchNorm), so every
    sample sees exactly the statistics/normalization it would in the
    reference's sequential pass order (intro.py:56-196) while the MXU
    runs at 2x the batch. Numerics match the unpaired step to float
    round-off (tests/test_solvers.py); running stats compose in the
    reference's per-network pass order.

    remat_passes=True wraps every encode/decode pass in ``jax.checkpoint``:
    the forward keeps only each pass's input/output tensors (images, z,
    BN stats) and the backward recomputes the pass internals. Per-block
    remat (models remat=True) still keeps cross-pass block-boundary
    activations of all ~7 passes live; this is the stronger memory lever
    for large batches at 256px (BENCHMARKS.md), numerically invisible.
    """
    enc_p, dec_p = encode, decode
    if remat_passes:
        _enc = jax.checkpoint(encode, static_argnums=(0, 4, 5))
        _dec = jax.checkpoint(decode, static_argnums=(0, 4, 5))

        def enc_p(m, p, s, x, train=True, groups=1):
            return _enc(m, p, s, x, train, groups)

        def dec_p(m, p, s, z, train=True, groups=1):
            return _dec(m, p, s, z, train, groups)

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        rng, k_noise, k_real, k_rec_e, k_fake_e, k_rec_d, k_fake_d = (
            jax.random.split(state.rng, 7)
        )
        b = batch.shape[0]
        noise = jax.random.normal(k_noise, (b, h.zdim))

        # ================= Phase E: update encoder =======================
        def loss_e(params_e, params_d, stats):
            se, sd = stats["encoder"], stats["decoder"]
            if paired:
                mu, logvar, se = enc_p(encoder, params_e, se, batch)
                z = ops.reparameterize(k_real, mu, logvar)
                # decoder pass-group order (noise, z) == reference
                # dec(noise) ... dec(z) sequence (intro.py:71,75)
                fz, sd = dec_p(decoder, params_d, sd,
                                jnp.concatenate([noise, z]), groups=2)
                fake, rec = jnp.split(fz, 2)

                loss_rec = rec_term(h, batch, rec, reduction="mean")
                lossE_real_kl, kl_unscaled = kl_term(h, z, mu, logvar)

                mus, logvars, se = enc_p(
                    encoder, params_e, se, sg(jnp.concatenate([rec, fake])),
                    groups=2,
                )
                rec_mu, fake_mu = jnp.split(mus, 2)
                rec_logvar, fake_logvar = jnp.split(logvars, 2)
                z_rec = ops.reparameterize(k_rec_e, rec_mu, rec_logvar)
                z_fake = ops.reparameterize(k_fake_e, fake_mu, fake_logvar)
                rr, sd = dec_p(decoder, params_d, sd,
                                jnp.concatenate([z_rec, z_fake]), groups=2)
                rec_rec, rec_fake = jnp.split(rr, 2)
            else:
                fake, sd = dec_p(decoder, params_d, sd, noise)

                mu, logvar, se = enc_p(encoder, params_e, se, batch)
                z = ops.reparameterize(k_real, mu, logvar)
                rec, sd = dec_p(decoder, params_d, sd, z)

                loss_rec = rec_term(h, batch, rec, reduction="mean")
                lossE_real_kl, kl_unscaled = kl_term(h, z, mu, logvar)

                rec_mu, rec_logvar, se = enc_p(encoder, params_e, se, sg(rec))
                z_rec = ops.reparameterize(k_rec_e, rec_mu, rec_logvar)
                rec_rec, sd = dec_p(decoder, params_d, sd, z_rec)

                fake_mu, fake_logvar, se = enc_p(encoder, params_e, se, sg(fake))
                z_fake = ops.reparameterize(k_fake_e, fake_mu, fake_logvar)
                rec_fake, sd = dec_p(decoder, params_d, sd, z_fake)

            kl_rec, _ = kl_term(h, z_rec, rec_mu, rec_logvar,
                                reduce="none", beta=h.beta_neg)
            kl_fake, _ = kl_term(h, z_fake, fake_mu, fake_logvar,
                                 reduce="none", beta=h.beta_neg)

            rec_rec_e = rec_term(h, rec, rec_rec, reduction="none")
            rec_fake_e = rec_term(h, fake, rec_fake, reduction="none")

            expelbo_rec = jnp.mean(jnp.exp(-2.0 * h.scale * (rec_rec_e + kl_rec)))
            expelbo_fake = jnp.mean(jnp.exp(-2.0 * h.scale * (rec_fake_e + kl_fake)))

            lossE = (
                h.scale * (loss_rec + lossE_real_kl)
                + 0.25 * (expelbo_rec + expelbo_fake)
            )
            aux = dict(
                z=z,
                lossE_real_kl=lossE_real_kl,
                kl_loss_unscaled=kl_unscaled,
                expelbo_r=expelbo_rec,
                expelbo_f=expelbo_fake,
                stats={"encoder": se, "decoder": sd},
            )
            if h.kl_kind == "tc_full":
                aux.update(tc_decomp_metrics(h, z, mu, logvar))
            return lossE, aux

        (lossE, aux_e), grads_e = jax.value_and_grad(loss_e, has_aux=True)(
            state.params["encoder"], state.params["decoder"], state.batch_stats
        )
        fc_grad_norm = global_norm(grads_e["fc"])
        total_norm_e = jnp.zeros(())
        if h.clip:
            grads_e, total_norm_e = clip_by_global_norm(grads_e, h.clip)

        upd_e, opt_state_e = opt_e.update(
            grads_e, state.opt_state_e, state.params["encoder"]
        )
        params_e = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params["encoder"], upd_e
        )

        # ================= Phase D: update decoder =======================
        z_detached = sg(aux_e["z"])

        def loss_d(params_d, params_e, stats):
            se, sd = stats["encoder"], stats["decoder"]
            if paired:
                fr, sd = dec_p(decoder, params_d, sd,
                                jnp.concatenate([noise, z_detached]), groups=2)
                fake, rec = jnp.split(fr, 2)
                loss_rec = rec_term(h, batch, rec, reduction="mean")

                # encoder pass-group order (rec, fake) == reference
                # enc(rec) ... enc(fake) sequence (intro.py:128-132)
                mus, logvars, se = enc_p(
                    encoder, params_e, se, jnp.concatenate([rec, fake]),
                    groups=2,
                )
                rec_mu, fake_mu = jnp.split(mus, 2)
                rec_logvar, fake_logvar = jnp.split(logvars, 2)
                z_rec = ops.reparameterize(k_rec_d, rec_mu, rec_logvar)
                z_fake = ops.reparameterize(k_fake_d, fake_mu, fake_logvar)

                rr, sd = dec_p(decoder, params_d, sd,
                                sg(jnp.concatenate([z_rec, z_fake])), groups=2)
                rec_rec, rec_fake = jnp.split(rr, 2)
            else:
                fake, sd = dec_p(decoder, params_d, sd, noise)
                rec, sd = dec_p(decoder, params_d, sd, z_detached)
                loss_rec = rec_term(h, batch, rec, reduction="mean")

                rec_mu, rec_logvar, se = enc_p(encoder, params_e, se, rec)
                z_rec = ops.reparameterize(k_rec_d, rec_mu, rec_logvar)
                fake_mu, fake_logvar, se = enc_p(encoder, params_e, se, fake)
                z_fake = ops.reparameterize(k_fake_d, fake_mu, fake_logvar)

                rec_rec, sd = dec_p(decoder, params_d, sd, sg(z_rec))
                rec_fake, sd = dec_p(decoder, params_d, sd, sg(z_fake))

            loss_rec_rec = rec_term(h, sg(rec), rec_rec, reduction="mean",
                                    beta=h.gamma_r * h.beta_rec)
            loss_fake_rec = rec_term(h, sg(fake), rec_fake, reduction="mean",
                                     beta=h.gamma_r * h.beta_rec)

            lossD_rec_kl, _ = kl_term(h, z_rec, rec_mu, rec_logvar)
            lossD_fake_kl, _ = kl_term(h, z_fake, fake_mu, fake_logvar)

            lossD = h.scale * (
                loss_rec
                + 0.5 * (lossD_rec_kl + lossD_fake_kl)
                + 0.5 * (loss_rec_rec + loss_fake_rec)
            )
            aux = dict(
                loss_rec=loss_rec,
                r_loss_unscaled=loss_rec / jnp.maximum(h.beta_rec, 1e-12),
                lossD_fake_kl=lossD_fake_kl,
                stats={"encoder": se, "decoder": sd},
            )
            return lossD, aux

        (lossD, aux_d), grads_d = jax.value_and_grad(loss_d, has_aux=True)(
            state.params["decoder"], params_e, aux_e["stats"]
        )
        total_norm_d = jnp.zeros(())
        if h.clip:
            grads_d, total_norm_d = clip_by_global_norm(grads_d, h.clip)

        upd_d, opt_state_d = opt_d.update(
            grads_d, state.opt_state_d, state.params["decoder"]
        )
        params_d = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params["decoder"], upd_d
        )

        new_state = state.replace(
            step=state.step + 1,
            params={"encoder": params_e, "decoder": params_d},
            batch_stats=aux_d["stats"],
            opt_state_e=opt_state_e,
            opt_state_d=opt_state_d,
            rng=rng,
        )
        metrics = dict(
            loss_enc=lossE,
            loss_dec=lossD,
            lossE=lossE,
            lossD=lossD,
            loss_kl=aux_e["lossE_real_kl"],
            loss_rec=aux_d["loss_rec"],
            kl_loss_unscaled=aux_e["kl_loss_unscaled"],
            r_loss_unscaled=aux_d["r_loss_unscaled"],
            expelbo_f=aux_e["expelbo_f"],
            expelbo_r=aux_e["expelbo_r"],
            diff_kl=-aux_e["lossE_real_kl"] + aux_d["lossD_fake_kl"],
            fc_grad_norm=fc_grad_norm,
        )
        metrics.update(
            {k: v for k, v in aux_e.items() if k.startswith("tc_decomp/")}
        )
        if h.clip:
            metrics["total_norm_E"] = total_norm_e
            metrics["total_norm_D"] = total_norm_d
            metrics["L2"] = jnp.maximum(total_norm_e, total_norm_d)
        return new_state, metrics

    return step


class IntroSolver(VAESolver):
    """Soft-Intro VAE solver (reference solvers/intro.py:17-196)."""

    kl_kind = "gaussian"

    def build_step(self):
        return build_intro_step(
            self.hyper, self.encoder, self.decoder,
            self.optimizer_e, self.optimizer_d,
            paired=self.fuse_passes,
            remat_passes=self.remat_passes,
        )
