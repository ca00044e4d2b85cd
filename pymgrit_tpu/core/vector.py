"""Pytree state algebra.

The reference's ``Vector`` class hierarchy (reference:
src/pymgrit/core/vector.py:19-151, an 11-method ABC every application must
subclass) is replaced by a *protocol*: a solution state at one time point is
any JAX pytree of arrays.  Addition/subtraction/scaling/norm become tree_map
operations; ``pack``/``unpack`` disappear (SPMD collectives move pytrees
wholesale); ``clone*`` becomes ``zeros_like`` / PRNG sampling.

A *time-batched* state ("tube") is the same pytree with a leading time axis on
every leaf.  The solver stores one tube per MGRIT level and uses the gather /
scatter / where helpers below to act on C-point / F-point subsets in bulk.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

Pytree = Any


def add(a: Pytree, b: Pytree) -> Pytree:
    """a + b leafwise (reference: Vector.__add__, vector.py:38-46)."""
    return jax.tree_util.tree_map(jnp.add, a, b)


def sub(a: Pytree, b: Pytree) -> Pytree:
    """a - b leafwise (reference: Vector.__sub__, vector.py:48-56)."""
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def scale(a: Pytree, s) -> Pytree:
    """s * a leafwise (reference: Vector.__mul__, vector.py:58-66)."""
    return jax.tree_util.tree_map(lambda x: x * s, a)


def axpy(y: Pytree, alpha, x: Pytree) -> Pytree:
    """y + alpha * x leafwise."""
    return jax.tree_util.tree_map(lambda yy, xx: yy + alpha * xx, y, x)


def norm(a: Pytree):
    """2-norm over all leaves concatenated (reference: Vector.norm contract —
    every application returns the flat 2-norm of its data, e.g.
    heat_2d.py:70-76 Frobenius norm)."""
    leaves = jax.tree_util.tree_leaves(a)
    sq = sum(jnp.sum(jnp.square(leaf)) for leaf in leaves)
    return jnp.sqrt(sq)


def zeros_like(a: Pytree) -> Pytree:
    """Zero state with the same structure (reference: Vector.clone_zero)."""
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def random_like(a: Pytree, key) -> Pytree:
    """Uniform[0,1) state with the same structure (reference:
    Vector.clone_rand, applications use np.random.rand)."""
    leaves, treedef = jax.tree_util.tree_flatten(a)
    keys = jax.random.split(key, len(leaves))
    new = [
        jax.random.uniform(k, shape=jnp.shape(leaf), dtype=jnp.result_type(leaf))
        for k, leaf in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new)


# ---------------------------------------------------------------------------
# Time-batched ("tube") helpers: every leaf carries a leading time axis.
# ---------------------------------------------------------------------------


def take(tube: Pytree, idx) -> Pytree:
    """Gather time indices: tube[idx] on every leaf."""
    return jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), tube)


def dynamic_index(tube: Pytree, i) -> Pytree:
    """tube[i] on every leaf (single index, axis dropped)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False), tube)


def set_at(tube: Pytree, idx, values: Pytree, mode: str = "promise_in_bounds") -> Pytree:
    """Scatter-set: tube.at[idx].set(values) on every leaf.

    With ``mode='drop'`` out-of-range indices are ignored, which implements
    masked scatters (write index >= nt to drop a lane).
    """
    return jax.tree_util.tree_map(
        lambda x, v: x.at[idx].set(v, mode=mode), tube, values
    )


def add_at(tube: Pytree, idx, values: Pytree, mode: str = "promise_in_bounds") -> Pytree:
    """Scatter-add: tube.at[idx].add(values) on every leaf."""
    return jax.tree_util.tree_map(
        lambda x, v: x.at[idx].add(v, mode=mode), tube, values
    )


def where(mask, a: Pytree, b: Pytree) -> Pytree:
    """Select a where mask else b; mask broadcasts against leading axes."""

    def _sel(x, y):
        m = jnp.reshape(mask, jnp.shape(mask) + (1,) * (x.ndim - jnp.ndim(mask)))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(_sel, a, b)


def stack(states) -> Pytree:
    """Stack a list of single states into a tube."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *states)


def concat(tubes) -> Pytree:
    """Concatenate tubes along the time axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *tubes)


def tube_of(template: Pytree, nt: int) -> Pytree:
    """A zero tube of nt copies of template."""
    return jax.tree_util.tree_map(
        lambda x: jnp.zeros((nt,) + jnp.shape(x), dtype=jnp.result_type(x)), template
    )


def length(tube: Pytree) -> int:
    """Length of the time axis."""
    return jax.tree_util.tree_leaves(tube)[0].shape[0]


def batched_norm(tube: Pytree):
    """Per-time-point 2-norm: vmap of norm over the leading axis."""
    return jax.vmap(norm)(tube)


def as_f64(a: Pytree) -> Pytree:
    """Cast all leaves to the default float dtype (f64 when x64 is on)."""
    dt = jnp.zeros(()).dtype
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=dt), a)
