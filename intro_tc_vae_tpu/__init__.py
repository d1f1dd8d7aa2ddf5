"""intro_tc_vae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Intro-TC-VAE framework.

A from-scratch rebuild of the capabilities of meffmadd/intro-tc-vae
(reference mounted at /root/reference) designed TPU-first:

* pure-functional loss ops (``ops``) compiled by XLA, with a blockwise
  Pallas kernel for the O(B^2·z) total-correlation estimate,
* flax.linen conv VAE model zoo in NHWC layout (``models``),
* solvers expressed as jitted train steps with explicit PRNG threading and
  per-subtree optax optimizers (``solvers``),
* a host-side data pipeline feeding device-resident, mesh-sharded batches
  (``data``),
* SPMD parallelism via ``jax.sharding.Mesh`` + NamedSharding (``parallel``),
* disentanglement metrics (beta-VAE, DCI, MIG, Modularity/Explicitness)
  (``evaluation``), and
* TensorBoard observability, Orbax checkpointing, and profiling (``utils``).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the flagship intro_tc step is a large
# program (~11 conv forwards + 2 grads); caching makes repeat runs start
# in seconds instead of minutes.
_cache_dir = _os.environ.get("ITCVAE_COMPILATION_CACHE", "/tmp/itcvae-jax-cache")
try:
    # TPU-only: XLA:CPU persists host-specific AOT code that can SIGILL on
    # a different host; TPU executables are portable across same-gen chips.
    if _os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # older jax without the knobs — fine, just slower
    pass
