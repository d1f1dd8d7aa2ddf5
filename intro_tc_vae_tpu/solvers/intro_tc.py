"""Intro-TC-VAE: the flagship solver — Soft-Intro's two-phase adversarial
step with every KL term replaced by the β-TC composition.

Reference: solvers/intro_tc.py:7-17 (diamond mixin delegating
``compute_kl_loss`` to the TC solver). Here it is simply the intro step
built with ``kl_kind='tc'``: all four KL sites (real, rec, fake in phase E;
rec, fake in phase D) become (β-1)·TC + KL, so the O(B²·z) TC estimate runs
~5x per step — the hot path the Pallas kernel accelerates.
"""

from __future__ import annotations

from intro_tc_vae_tpu.solvers.intro import IntroSolver


class IntroTCSolver(IntroSolver):
    kl_kind = "tc"


# Reference public API spells it 'IntroTCSovler' (intro_tc.py:7, quirk Q9).
IntroTCSovler = IntroTCSolver
