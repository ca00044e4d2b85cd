"""Couplings to external (non-JAX) steppers and solvers."""

from pymgrit_tpu.coupling.callback import CallbackApplication

__all__ = ["CallbackApplication"]
