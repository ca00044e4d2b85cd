"""Application construction contract + pytree state algebra.

Mirrors reference tests/core/test_application.py (missing-attribute
metaclass check, time-grid construction) and the per-application Vector
algebra contract tests (e.g. reference tests/heat/test_heat_2d.py:295-381)
on the pytree protocol."""

import numpy as np
import jax.numpy as jnp
import pytest

from pymgrit_tpu import Application, Dahlquist
from pymgrit_tpu.core import vector


def test_missing_required_attributes_raise():
    class Bad(Application):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.vector_template = np.zeros(3)
            # vector_t_start intentionally left unset

        def step(self, u_start, t_start, t_stop):
            return u_start

    with pytest.raises(ValueError):
        Bad(t_start=0, t_stop=1, nt=5)


def test_time_grid_construction():
    d = Dahlquist(t_start=0, t_stop=5, nt=11)
    np.testing.assert_allclose(d.t, np.linspace(0, 5, 11))
    t_int = np.linspace(0, 3, 7)
    d2 = Dahlquist(t_interval=t_int)
    assert d2.nt == 7 and d2.t_start == 0 and d2.t_end == 3
    with pytest.raises(Exception):
        Dahlquist(t_start=0, nt=5)          # missing t_stop
    with pytest.raises(Exception):
        Dahlquist(t_interval=[0, 1, 2])     # wrong type


def test_pytree_state_algebra():
    """add/sub/scale/norm/zeros/random on nested pytree states (the
    reference Vector 11-method contract)."""
    u = {"a": jnp.array([3.0, 4.0]), "b": jnp.zeros((2, 2))}
    v = {"a": jnp.array([1.0, 1.0]), "b": jnp.ones((2, 2))}
    s = vector.add(u, v)
    np.testing.assert_allclose(s["a"], [4.0, 5.0])
    d = vector.sub(s, v)
    np.testing.assert_allclose(d["a"], u["a"])
    m = vector.scale(u, 2.0)
    np.testing.assert_allclose(m["a"], [6.0, 8.0])
    assert abs(float(vector.norm(u)) - 5.0) < 1e-14
    z = vector.zeros_like(u)
    assert float(vector.norm(z)) == 0.0
    import jax
    r = vector.random_like(u, jax.random.PRNGKey(0))
    assert r["a"].shape == (2,) and r["b"].shape == (2, 2)
    assert float(vector.norm(r)) > 0

    # tube helpers
    tube = vector.tube_of(u, 5)
    assert vector.length(tube) == 5
    tube = vector.set_at(tube, jnp.array([2]),
                         jax.tree_util.tree_map(lambda x: x[None], u))
    picked = vector.take(tube, jnp.array([2]))
    np.testing.assert_allclose(picked["a"][0], u["a"])
    norms = vector.batched_norm(tube)
    assert norms.shape == (5,)
    assert abs(float(norms[2]) - 5.0) < 1e-14
