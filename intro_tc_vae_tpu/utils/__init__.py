"""Observability + persistence: TB writer singleton, loss averaging,
checkpointing (Orbax), NaN scanning, profiling."""

from intro_tc_vae_tpu.utils.writer import SingletonWriter, make_writer
from intro_tc_vae_tpu.utils.lossdict import LossDict
from intro_tc_vae_tpu.utils.checkpoint import (
    load_checkpoint,
    load_model,
    save_checkpoint,
    save_losses,
)
from intro_tc_vae_tpu.utils.nan import check_non_finite_gradients, check_non_finite_gradints
from intro_tc_vae_tpu.utils.profiling import profile_trace

__all__ = [
    "SingletonWriter",
    "make_writer",
    "LossDict",
    "save_checkpoint",
    "load_checkpoint",
    "load_model",
    "save_losses",
    "check_non_finite_gradients",
    "check_non_finite_gradints",
    "profile_trace",
]
