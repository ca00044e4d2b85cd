"""Pallas fused spectral solve vs the XLA einsum path (interpret mode on
CPU; the TPU compiled path is exercised by bench/A-B scripts)."""

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu.ops.dirichlet_spectral import sine_eigenbasis
from pymgrit_tpu.ops.pallas_spectral import batched_sine_solve_2d, xla_sine_solve_2d


def test_pallas_matches_xla():
    rng = np.random.default_rng(1)
    n, B = 31, 5
    Sx, lamx = sine_eigenbasis(n, 2.5)
    Sy, lamy = sine_eigenbasis(n, 1.5)
    b = jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32))
    shift = jnp.asarray((0.01 + 0.1 * rng.random(B)).astype(np.float32))

    ref = xla_sine_solve_2d(b, shift, jnp.asarray(Sx, jnp.float32),
                            jnp.asarray(Sy, jnp.float32),
                            jnp.asarray(lamx, jnp.float32),
                            jnp.asarray(lamy, jnp.float32))
    out = batched_sine_solve_2d(b, shift, jnp.asarray(Sx, jnp.float32),
                                jnp.asarray(Sy, jnp.float32),
                                jnp.asarray(lamx, jnp.float32),
                                jnp.asarray(lamy, jnp.float32),
                                block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_solves_system():
    """out satisfies (I + shift*L) out = b."""
    n, B = 15, 3
    fac = 3.0
    Sx, lamx = sine_eigenbasis(n, fac)
    Sy, lamy = sine_eigenbasis(n, fac)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((B, n, n)))
    shift = jnp.asarray(np.full(B, 0.05))
    out = batched_sine_solve_2d(b, shift, jnp.asarray(Sx), jnp.asarray(Sy),
                                jnp.asarray(lamx), jnp.asarray(lamy),
                                block=3, interpret=True)
    # Apply (I + shift*L): L = kron structure via the dense 1D stencils
    L1 = np.asarray(Sx) @ np.diag(np.asarray(lamx)) @ np.asarray(Sx)
    for i in range(B):
        lhs = np.asarray(out[i]) + 0.05 * (L1 @ np.asarray(out[i]) +
                                           np.asarray(out[i]) @ L1.T)
        np.testing.assert_allclose(lhs, np.asarray(b[i]), atol=1e-9)
