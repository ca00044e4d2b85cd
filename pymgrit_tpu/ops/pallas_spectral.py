"""Pallas TPU kernel: fused batched 2D sine-eigenbasis solve.

The hot op of the flagship heat_2d problem is, per batched time interval,

    out = Sx @ ((Sx @ b @ Sy) / (1 + shift * (lamx + lamy))) @ Sy

— four small matmuls with an elementwise rescale in between.  Under plain
XLA each stage round-trips the (B, n, n) intermediate through HBM; this
kernel keeps the whole chain in VMEM per block of lanes: the eigenbases are
loaded once per program, every lane's four MXU matmuls and the VPU rescale
run back-to-back, and only b and out touch HBM.

Shapes are padded to multiples of 8x128 tiles by construction: the n x n
operators are zero-padded to (np_, np_) with np_ = ceil(n/128)*128 for the
lane dimension when n is small; padded rows/cols are zero in S so results
stay exact (denominator pads to 1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def batched_sine_solve_2d(b, shift, Sx, Sy, lamx, lamy, block: int = 8,
                          interpret: bool = None):
    """Solve (I + shift_i * L) x_i = b_i for a batch of right-hand sides.

    :param b: (B, n, n) right-hand sides
    :param shift: (B,) per-lane shift (dt * theta)
    :param Sx, Sy: (n, n) orthonormal sine eigenbases
    :param lamx, lamy: (n,) eigenvalues
    :param block: lanes per pallas program
    :param interpret: run in interpreter mode (tests on CPU)
    """
    if interpret is None:
        # auto: compiled Mosaic on TPU, interpreter elsewhere (CPU tests)
        interpret = jax.default_backend() != "tpu"
    B, nx, ny = b.shape
    dtype = b.dtype
    # Pad both axes to the 128-lane tile: exact because padded rows/cols of
    # S are zero and padded eigenvalues are zero (denominator 1).  The
    # padding overhead vanishes for n >= 127; for small n the XLA fallback
    # is usually the better choice.
    np_ = _round_up(nx, 128)
    nl = _round_up(ny, 128)
    Bp = _round_up(B, block)

    Sx_p = jnp.zeros((np_, np_), dtype).at[:nx, :nx].set(Sx.astype(dtype))
    Sy_p = jnp.zeros((nl, nl), dtype).at[:ny, :ny].set(Sy.astype(dtype))
    lamx_p = jnp.zeros((np_, 1), dtype).at[:nx, 0].set(lamx.astype(dtype))
    lamy_p = jnp.zeros((1, nl), dtype).at[0, :ny].set(lamy.astype(dtype))
    b_p = jnp.zeros((Bp, np_, nl), dtype).at[:B, :nx, :ny].set(b)
    shift_p = jnp.zeros((Bp, 1), dtype).at[:B, 0].set(shift.astype(dtype))

    grid = (Bp // block,)

    def kernel(shift_ref, b_ref, sx_ref, sy_ref, lx_ref, ly_ref, out_ref):
        sx = sx_ref[...]
        sy = sy_ref[...]
        denom_base = lx_ref[...] + ly_ref[...]          # (np_, nl)
        for l in range(block):
            bb = b_ref[l]
            p = jnp.dot(sx, bb, preferred_element_type=dtype)
            q = jnp.dot(p, sy, preferred_element_type=dtype)
            denom = 1.0 + shift_ref[l, 0] * denom_base
            m = q / denom
            r = jnp.dot(sx, m, preferred_element_type=dtype)
            out_ref[l] = jnp.dot(r, sy, preferred_element_type=dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, np_, nl), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, np_, nl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, nl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, np_, nl), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(shift_p, b_p, Sx_p, Sy_p, lamx_p, lamy_p)
    return out[:B, :nx, :ny]


def xla_sine_solve_2d(b, shift, Sx, Sy, lamx, lamy):
    """Reference/fallback: same computation as plain batched einsums."""
    bh = jnp.einsum('ij,bjk,kl->bil', Sx, b, Sy)
    denom = 1.0 + shift[:, None, None] * (lamx[:, None] + lamy[None, :])[None]
    return jnp.einsum('ij,bjk,kl->bil', Sx, bh / denom, Sy)
