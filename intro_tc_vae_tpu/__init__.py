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
