"""Disentanglement evaluation: ground-truth-factor sampling + 4 metric
families (beta-VAE score, DCI, MIG, Modularity/Explicitness).

Parity surface of reference evaluation/ (generator.py, metrics.py,
utils.py), with two TPU-era changes: metrics consume a jitted
``encode_fn(images) -> (mu, logvar)`` callable instead of a torch module,
and the DCI informativeness classifier defaults to sklearn
(xgboost's gpu_hist is CUDA-only — reference quirk Q13 — and xgboost may
be absent; it is used when importable).
"""

from intro_tc_vae_tpu.evaluation.generator import FeatureIndex, LatentGenerator
from intro_tc_vae_tpu.evaluation.metrics import (
    compute_bvae_score,
    compute_dci_score,
    compute_mig_score,
    compute_mod_expl_score,
    write_bvae_score,
    write_dci_score,
    write_mig_score,
    write_mod_expl_score,
)

__all__ = [
    "FeatureIndex",
    "LatentGenerator",
    "compute_bvae_score",
    "compute_dci_score",
    "compute_mig_score",
    "compute_mod_expl_score",
    "write_bvae_score",
    "write_dci_score",
    "write_mig_score",
    "write_mod_expl_score",
]
