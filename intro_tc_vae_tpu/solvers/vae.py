"""Single-phase ELBO train step (vae / tc solvers).

One fused jitted function: forward, loss, grads w.r.t. both subtrees,
optional global-norm clip, two optax updates. Reference semantics:
solvers/vae.py:89-136 (loss = scale * (beta_rec*rec_mean + kl_term)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intro_tc_vae_tpu import ops
from intro_tc_vae_tpu.solvers.base import (
    SolverHyper,
    TrainState,
    clip_by_global_norm,
    decode,
    encode,
    global_norm,
    kl_term,
    rec_term,
    tc_decomp_metrics,
)


def build_vae_step(h: SolverHyper, encoder, decoder, opt_e, opt_d):
    """Build the jitted (state, batch) -> (state, metrics) ELBO step."""

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        rng, k_rep = jax.random.split(state.rng)

        def loss_fn(params):
            mu, logvar, stats_e = encode(
                encoder, params["encoder"], state.batch_stats["encoder"], batch
            )
            z = ops.reparameterize(k_rep, mu, logvar)
            rec, stats_d = decode(
                decoder, params["decoder"], state.batch_stats["decoder"], z
            )
            loss_rec = rec_term(h, batch, rec, reduction="mean")
            loss_kl, kl_unscaled = kl_term(h, z, mu, logvar)
            loss = h.scale * (loss_rec + loss_kl)
            aux = dict(
                loss_rec=loss_rec,
                loss_kl=loss_kl,
                kl_loss_unscaled=kl_unscaled,
                r_loss_unscaled=loss_rec / jnp.maximum(h.beta_rec, 1e-12),
                batch_stats={"encoder": stats_e, "decoder": stats_d},
            )
            if h.kl_kind == "tc_full":
                aux.update(tc_decomp_metrics(h, z, mu, logvar))
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        metrics = dict(
            loss_enc=loss,
            loss_dec=loss,
            loss_kl=aux["loss_kl"],
            loss_rec=aux["loss_rec"],
            kl_loss_unscaled=aux["kl_loss_unscaled"],
            r_loss_unscaled=aux["r_loss_unscaled"],
            fc_grad_norm=global_norm(grads["encoder"]["fc"]),
        )
        metrics.update({k: v for k, v in aux.items() if k.startswith("tc_decomp/")})
        if h.clip:
            grads, total_norm = clip_by_global_norm(grads, h.clip)
            metrics["total_norm"] = total_norm
            metrics["L2"] = total_norm

        upd_e, opt_state_e = opt_e.update(
            grads["encoder"], state.opt_state_e, state.params["encoder"]
        )
        upd_d, opt_state_d = opt_d.update(
            grads["decoder"], state.opt_state_d, state.params["decoder"]
        )
        params = {
            "encoder": jax.tree_util.tree_map(
                lambda p, u: p + u, state.params["encoder"], upd_e
            ),
            "decoder": jax.tree_util.tree_map(
                lambda p, u: p + u, state.params["decoder"], upd_d
            ),
        }

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=aux["batch_stats"],
            opt_state_e=opt_state_e,
            opt_state_d=opt_state_d,
            rng=rng,
        )
        return new_state, metrics

    return step
