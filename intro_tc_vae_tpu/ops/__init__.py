"""Pure-functional loss math. Everything here is jit-/vmap-/grad-safe jnp.

Parity surface of the reference ``ops.py`` (/root/reference/ops.py), rebuilt
for XLA: static shapes, no host round-trips, importance-weight matrices are
constant-folded at trace time instead of being re-allocated per step
(reference quirk Q8, ops.py:32-49).
"""

from intro_tc_vae_tpu.ops.losses import (
    entropy,
    kl_divergence,
    kl_no_reduce,
    reconstruction_loss,
    reparameterize,
)
from intro_tc_vae_tpu.ops.density import (
    gaussian_log_density,
    gaussian_log_density_nll,
    log_importance_weight_matrix,
    minibatch_stratified_sampling,
    minibatch_weighted_sampling,
    on_off_diag,
)
from intro_tc_vae_tpu.ops.tc import (
    total_correlation,
    total_correlation_sharded,
    tc_decomposition,
)

__all__ = [
    "entropy",
    "kl_divergence",
    "kl_no_reduce",
    "reconstruction_loss",
    "reparameterize",
    "gaussian_log_density",
    "gaussian_log_density_nll",
    "log_importance_weight_matrix",
    "minibatch_stratified_sampling",
    "minibatch_weighted_sampling",
    "on_off_diag",
    "total_correlation",
    "total_correlation_sharded",
    "tc_decomposition",
]
