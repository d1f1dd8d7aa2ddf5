"""Checkpointing via Orbax.

Parity surface of reference utils.py:10-36 (save_checkpoint/load_model)
with the same filename-fingerprint scheme
(./saves/{prefix}model_epoch_E_iter_I), plus a deliberate fix of
reference quirk Q12: optimizer state IS checkpointed, so resume restores
Adam moments.

The PRNG key is intentionally NOT checkpointed: a resumed run continues
with a fresh stream from the config seed (the reference restores no RNG
state either — torch's global RNG simply keeps going).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_path(checkpoint_dir: str, prefix: str, epoch: int, iteration: int) -> str:
    name = f"{prefix}model_epoch_{epoch}_iter_{iteration}"
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_async_ckptr = None  # lazily created, shared so saves serialize correctly


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def finalize_checkpoints() -> None:
    """Block until any in-flight async checkpoint save has committed.

    Call before process exit (train.py does) — an async save that hasn't
    finished is not a valid checkpoint directory yet.
    """
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(
    state: Any,
    epoch: int,
    iteration: int,
    prefix: str = "",
    checkpoint_dir: str = "./saves",
    async_save: bool = False,
) -> str:
    """Save full train state (params + batch_stats + optimizer states).

    Uses Orbax's StandardCheckpointer; the payload is a pure pytree.
    With ``async_save`` the D2H copy + write happen on a background
    thread (Orbax AsyncCheckpointer) so the train loop keeps stepping;
    a subsequent save or ``finalize_checkpoints()`` waits for the
    previous one. Returns the checkpoint path.
    """
    import orbax.checkpoint as ocp

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = _ckpt_path(checkpoint_dir, prefix, epoch, iteration)
    if async_save:
        # hand the device arrays to orbax directly — it snapshots/copies
        # asynchronously without stalling the step loop
        payload = {
            "epoch": np.asarray(epoch),
            "step": np.asarray(state.step),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state_e": state.opt_state_e,
            "opt_state_d": state.opt_state_d,
        }
        ckptr = _get_async_checkpointer()
        ckptr.save(path, payload, force=True)
        print(f"model checkpoint saving (async) @ {path}")
        return path
    payload = {
        "epoch": np.asarray(epoch),
        "step": np.asarray(state.step),
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "opt_state_e": _to_numpy(state.opt_state_e),
        "opt_state_d": _to_numpy(state.opt_state_d),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    print(f"model checkpoint saved @ {path}")
    return path


def load_checkpoint(path: str, target_state: Optional[Any] = None):
    """Restore a checkpoint.

    With ``target_state`` (a freshly initialized TrainState), the restored
    arrays are structured exactly like the target (including optax state
    namedtuples) and a new TrainState is returned alongside the epoch.
    Without it, the raw payload dict is returned.
    """
    import logging

    import orbax.checkpoint as ocp

    finalize_checkpoints()  # never restore while an async save is in flight
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target_state is None:
            # targetless restore is fine for our own payloads; quiet the
            # (accurate but noisy) absl warning about it
            logger = logging.getLogger("absl")
            level = logger.level
            logger.setLevel(logging.ERROR)
            try:
                return ckptr.restore(path)
            finally:
                logger.setLevel(level)
        # raw (possibly device-resident, sharded) leaves: their shardings
        # survive to_shape_dtype_struct, so orbax restores directly onto
        # the target topology instead of reading sharding info from file
        abstract = {
            "epoch": np.asarray(0),
            "step": np.asarray(target_state.step),
            "params": target_state.params,
            "batch_stats": target_state.batch_stats,
            "opt_state_e": target_state.opt_state_e,
            "opt_state_d": target_state.opt_state_d,
        }
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, abstract)
        restored = ckptr.restore(path, abstract)
    new_state = target_state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state_e=restored["opt_state_e"],
        opt_state_d=restored["opt_state_d"],
    )
    return new_state, int(restored["epoch"])


def find_latest_checkpoint(checkpoint_dir: str, prefix: str = "") -> Optional[str]:
    """Newest checkpoint (by epoch, then iteration) matching the run's
    hparam prefix — powers ``resume: "auto"`` crash recovery."""
    import re

    if not os.path.isdir(checkpoint_dir):
        return None
    best, best_key = None, (-1, -1)
    pattern = re.compile(re.escape(prefix) + r"model_epoch_(\d+)_iter_(\d+)$")
    for name in os.listdir(checkpoint_dir):
        m = pattern.match(name)
        key = (int(m.group(1)), int(m.group(2))) if m else None
        if key is not None and key > best_key:
            best_key = key
            best = os.path.join(checkpoint_dir, name)
    return best


def load_model(state: Any, path: str):
    """Params/batch_stats-only restore into an existing state (the
    analogue of reference load_model's strict=False state_dict load)."""
    payload = load_checkpoint(path)
    return state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"]
    )


def save_losses(fig_dir: str, kls_real, kls_fake, kls_rec, rec_errs):
    """Pickle training curves (reference utils.py:15-23)."""
    with open(os.path.join(fig_dir, "soft_intro_train_graphs_data.pickle"), "wb") as fp:
        pickle.dump(
            {
                "kl_real": kls_real,
                "kl_fake": kls_fake,
                "kl_rec": kls_rec,
                "rec_err": rec_errs,
            },
            fp,
        )
