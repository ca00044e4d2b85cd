"""Heat2D(use_pallas=True): the fused batched path must match the vmap path
and the full MGRIT solve (pallas interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pymgrit_tpu import Heat2D, Mgrit


def _kw(**extra):
    kw = dict(x_start=0, x_end=0.75, y_start=0, y_end=1.5, nx=19, ny=27, a=3.5,
              rhs=lambda x, y, t: 3 * x * y + t * (x + y),
              bc_left=1.25, bc_right=-0.5, bc_bottom=2.0, bc_top=0.75,
              t_start=0, t_stop=1, nt=17)
    kw.update(extra)
    return kw


def test_batched_pallas_matches_vmap():
    for method in ("BE", "CN"):
        plain = Heat2D(method=method, **_kw())
        fused = Heat2D(method=method, use_pallas=True, **_kw())
        rng = np.random.default_rng(0)
        us = jnp.asarray(rng.standard_normal((6, 19, 27)))
        t0s = jnp.asarray(np.linspace(0, 0.5, 6))
        t1s = t0s + 0.07
        ref = jax.vmap(plain.step)(us, t0s, t1s)
        out = fused.step_batched(us, t0s, t1s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-9)


def test_mgrit_with_pallas_path():
    h0 = Heat2D(use_pallas=True, **_kw())
    h1 = Heat2D(use_pallas=True, **_kw(t_interval=h0.t[::2]))
    conv_pallas = Mgrit(problem=[h0, h1], max_iter=4, logging_lvl=30,
                        tol=1e-11).solve()['conv']

    g0 = Heat2D(**_kw())
    g1 = Heat2D(**_kw(t_interval=g0.t[::2]))
    conv_plain = Mgrit(problem=[g0, g1], max_iter=4, logging_lvl=30,
                       tol=1e-11).solve()['conv']
    # histories agree to roundoff (absolute floor for the converged tail)
    np.testing.assert_allclose(conv_pallas, conv_plain, rtol=1e-6, atol=1e-13)
