"""Non-finite detection helpers (reference utils.py:39-45, train.py:119-138).

The TPU-native anomaly mode is `jax.config.update('jax_debug_nans', True)`
(set by the train loop when config.anomaly_detection) — XLA raises at the
op that produced the first NaN, the analogue of torch's anomaly mode +
forward NaN hooks.
"""

from __future__ import annotations

import jax
import numpy as np


def check_non_finite_gradients(grads) -> list[str]:
    """Return the names of gradient leaves containing non-finite values."""
    import flax

    flat = flax.traverse_util.flatten_dict(grads, sep="/")
    bad = []
    for name, g in flat.items():
        arr = np.asarray(g)
        if not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            print(f"Non-finite gradients in {name}: {n_bad} values")
            bad.append(name)
    return bad


# Reference public API spells it 'gradints' (utils.py:39, quirk Q9).
check_non_finite_gradints = check_non_finite_gradients


def enable_anomaly_detection():
    """NaN-debugging mode: jitted code re-runs op-by-op on NaN production."""
    jax.config.update("jax_debug_nans", True)
