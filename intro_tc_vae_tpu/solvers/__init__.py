"""Solvers: per-step loss + optimizer logic as jitted pure functions.

The reference implements solvers as mutable classes flipping
``requires_grad`` between two backward passes (solvers/intro.py:66-69,
119-122). Here each solver compiles to ONE jitted train step:

* ``vae`` / ``tc``    — single fused value_and_grad + two optax updates
  (one per encoder/decoder subtree = the reference's two-optimizer design,
  train.py:143-144).
* ``intro`` / ``intro_tc`` — two sequential grad phases inside one jit:
  phase E differentiates w.r.t. encoder params only (decoder params are
  non-differentiated closure arguments), phase D vice versa, with
  BatchNorm batch_stats threaded through every forward in the reference's
  execution order.

Dispatch strings accept both the reference's "intro-tc" (train.py:187) and
BASELINE.json's "intro_tc".
"""

from intro_tc_vae_tpu.solvers.base import (
    SolverHyper,
    TrainState,
    VAESolver,
    make_optimizer,
    make_solver,
)
from intro_tc_vae_tpu.solvers.tc import TCSolver, TCSovler
from intro_tc_vae_tpu.solvers.intro import IntroSolver
from intro_tc_vae_tpu.solvers.intro_tc import IntroTCSolver, IntroTCSovler

__all__ = [
    "SolverHyper",
    "TrainState",
    "VAESolver",
    "TCSolver",
    "TCSovler",
    "IntroSolver",
    "IntroTCSolver",
    "IntroTCSovler",
    "make_optimizer",
    "make_solver",
]
