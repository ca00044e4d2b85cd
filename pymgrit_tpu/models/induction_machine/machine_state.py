"""Machine solution state.

Parity target: reference src/pymgrit/induction_machine/vector_machine.py:
16-188 — front/middle/back DOF blocks plus 8 scalar outputs (joule losses,
three phase currents ia/ib/ic, three phase voltages ua/ub/uc, torque tr).

As a pytree the state is a dict of arrays; the scalars live in one
(8,) leaf ordered [jl, ia, ib, ic, ua, ub, uc, tr].  The norm matches the
reference's (vector_machine.py:101-109): 2-norm over the DOF blocks only —
the scalar outputs are *excluded* — so the application exposes
``state_norm`` for the solver's residual/jump computations.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SCALARS = ("jl", "ia", "ib", "ic", "ua", "ub", "uc", "tr")


def MachineState(front, middle, back, scalars=None):
    """Build a machine state pytree."""
    if scalars is None:
        scalars = np.zeros(len(SCALARS))
    return {"front": front, "middle": middle, "back": back, "scalars": scalars}


def zero_state(front_size: int, middle_size: int, back_size: int):
    return MachineState(np.zeros(front_size), np.zeros(middle_size),
                        np.zeros(back_size))


def machine_norm(u):
    """2-norm over the DOF blocks, scalars excluded
    (reference vector_machine.py:101-109)."""
    return jnp.sqrt(jnp.sum(jnp.square(u["front"])) +
                    jnp.sum(jnp.square(u["middle"])) +
                    jnp.sum(jnp.square(u["back"])))


def get_values(u):
    """Concatenated DOF vector (reference vector_machine.py:137-143)."""
    return jnp.concatenate([jnp.atleast_1d(u["front"]), jnp.atleast_1d(u["middle"]),
                            jnp.atleast_1d(u["back"])])
