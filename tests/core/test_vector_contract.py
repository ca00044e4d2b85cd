"""Pytree state algebra contract, per representative state shape.

Mirrors the reference's full Vector-algebra batteries (reference:
tests/heat/test_heat_2d.py:295-381 and the per-application clones in
tests/dahlquist, tests/brusselator, ...): add/sub/scale/norm/zero/random
plus the tube (time-batched) helpers that replace pack/unpack under SPMD.
One parametrized battery covers every state pytree the model zoo uses:
scalar (Dahlquist), 1-D array (Heat1D/Advection), 2-D array (Heat2D/
AllenCahn), the 2-points-per-vector pair (VectorHeat1D2Pts,
reference heat/vector_heat_1d_2pts.py:17-29), and the induction-machine
dict state (reference induction_machine/vector_machine.py:16-37).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pymgrit_tpu.core import vector
from pymgrit_tpu.models.induction_machine.machine_state import (
    MachineState, machine_norm)


def _states():
    rng = np.random.default_rng(7)
    scalar = jnp.asarray(rng.standard_normal())
    arr1d = jnp.asarray(rng.standard_normal(11))
    arr2d = jnp.asarray(rng.standard_normal((5, 7)))
    pair = (jnp.asarray(rng.standard_normal(9)),
            jnp.asarray(rng.standard_normal(9)))
    machine = MachineState(jnp.asarray(rng.standard_normal(4)),
                           jnp.asarray(rng.standard_normal(6)),
                           jnp.asarray(rng.standard_normal(3)),
                           jnp.asarray(rng.standard_normal(8)))
    return {"scalar": scalar, "arr1d": arr1d, "arr2d": arr2d,
            "pair": pair, "machine": machine}


@pytest.fixture(params=["scalar", "arr1d", "arr2d", "pair", "machine"])
def state(request):
    return _states()[request.param]


def _flat(a):
    return np.concatenate([np.atleast_1d(np.asarray(x)).ravel()
                           for x in jax.tree_util.tree_leaves(a)])


def test_add_sub_scale_axpy(state):
    b = vector.scale(state, 0.5)
    np.testing.assert_allclose(_flat(vector.add(state, b)),
                               1.5 * _flat(state), rtol=1e-14)
    np.testing.assert_allclose(_flat(vector.sub(state, b)),
                               0.5 * _flat(state), rtol=1e-14)
    np.testing.assert_allclose(_flat(vector.axpy(state, -2.0, b)),
                               0.0 * _flat(state), atol=1e-14)
    # scalar * state commutes with the flat view (reference Vector.__rmul__)
    np.testing.assert_allclose(_flat(vector.scale(state, -3.0)),
                               -3.0 * _flat(state), rtol=1e-14)


def test_norm_is_flat_two_norm(state):
    # reference contract: norm = 2-norm of all data concatenated
    # (heat_2d.py:70-76; vector_machine.py norm over front/middle/back)
    np.testing.assert_allclose(float(vector.norm(state)),
                               np.linalg.norm(_flat(state)), rtol=1e-13)


def test_machine_norm_matches_generic():
    s = _states()["machine"]
    # machine norm excludes the 8 scalar outputs (vector_machine.py:39-47)
    expected = np.linalg.norm(np.concatenate(
        [np.asarray(s["front"]), np.asarray(s["middle"]), np.asarray(s["back"])]))
    np.testing.assert_allclose(float(machine_norm(s)), expected, rtol=1e-13)


def test_zero_and_random_clones(state):
    z = vector.zeros_like(state)
    assert jax.tree_util.tree_structure(z) == jax.tree_util.tree_structure(state)
    assert np.all(_flat(z) == 0.0)
    r = vector.random_like(state, jax.random.PRNGKey(0))
    flat = _flat(r)
    assert np.all((flat >= 0.0) & (flat < 1.0))  # clone_rand semantics
    assert jax.tree_util.tree_structure(r) == jax.tree_util.tree_structure(state)


def test_tube_roundtrip(state):
    nt = 6
    tube = vector.tube_of(state, nt)
    assert vector.length(tube) == nt
    tube = vector.set_at(tube, np.array([2]),
                         jax.tree_util.tree_map(lambda x: x[None],
                                                vector.as_f64(state)))
    got = vector.take(tube, np.array([2]))
    np.testing.assert_allclose(_flat(got), _flat(state), rtol=1e-14)
    # dynamic single-index view
    one = vector.dynamic_index(tube, 2)
    np.testing.assert_allclose(_flat(one), _flat(state), rtol=1e-14)
    # masked scatter with mode='drop' ignores out-of-range writes
    dropped = vector.set_at(tube, np.array([nt + 3]),
                            jax.tree_util.tree_map(lambda x: x[None] + 1.0,
                                                   vector.as_f64(state)),
                            mode="drop")
    np.testing.assert_allclose(_flat(dropped), _flat(tube), rtol=1e-14)


def test_stack_concat_batched_norm(state):
    s64 = vector.as_f64(state)
    tube = vector.stack([s64, vector.scale(s64, 2.0)])
    assert vector.length(tube) == 2
    norms = np.asarray(vector.batched_norm(tube))
    base = np.linalg.norm(_flat(s64))
    np.testing.assert_allclose(norms, [base, 2 * base], rtol=1e-13)
    both = vector.concat([tube, tube])
    assert vector.length(both) == 4


def test_where_masks_leading_axis(state):
    s64 = vector.as_f64(state)
    tube = vector.stack([s64, s64, s64])
    alt = vector.scale(tube, -1.0)
    mask = jnp.array([True, False, True])
    sel = vector.where(mask, tube, alt)
    got = vector.take(sel, np.array([1]))
    np.testing.assert_allclose(_flat(got), -_flat(s64), rtol=1e-14)
