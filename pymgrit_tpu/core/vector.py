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

from pymgrit_tpu.ops import dd as _ddm
from pymgrit_tpu.ops.dd import DD

Pytree = Any

# ---------------------------------------------------------------------------
# Double-double dispatch: algebraic ops treat DD pairs as single leaves so
# sums/scalings renormalize (componentwise hi+hi / lo+lo would leak the
# rounding error of hi and destroy the extra 24 bits).  Purely *structural*
# ops (take/set/where/stack/...) recurse into the components unchanged, so
# the solver's tube machinery needs no special cases.
# ---------------------------------------------------------------------------


def _is_dd(x) -> bool:
    return isinstance(x, DD)


def contains_dd(a: Pytree) -> bool:
    """True if any leaf of the state is a double-double pair."""
    return any(_is_dd(l) for l in jax.tree_util.tree_leaves(a, is_leaf=_is_dd))


def _amap(fn, *trees):
    """tree_map for algebraic ops: DD pairs are leaves."""
    return jax.tree_util.tree_map(fn, *trees, is_leaf=_is_dd)


def add(a: Pytree, b: Pytree) -> Pytree:
    """a + b leafwise (reference: Vector.__add__, vector.py:38-46)."""
    return _amap(lambda x, y: _ddm.add(x, y) if _is_dd(x) else jnp.add(x, y), a, b)


def sub(a: Pytree, b: Pytree) -> Pytree:
    """a - b leafwise (reference: Vector.__sub__, vector.py:48-56)."""
    return _amap(lambda x, y: _ddm.sub(x, y) if _is_dd(x) else jnp.subtract(x, y), a, b)


def scale(a: Pytree, s) -> Pytree:
    """s * a leafwise (reference: Vector.__mul__, vector.py:58-66).  For DD
    leaves a python-float s is split exactly, so e.g. weight_c=1.3 scales at
    full fp64 fidelity (f32(1.3) alone would perturb at 1e-8)."""
    return _amap(lambda x: _ddm.mul(x, _ddm.coerce(s)) if _is_dd(x) else x * s, a)


def axpy(y: Pytree, alpha, x: Pytree) -> Pytree:
    """y + alpha * x leafwise."""
    return _amap(
        lambda yy, xx: _ddm.add(yy, _ddm.mul(xx, _ddm.coerce(alpha)))
        if _is_dd(yy) else yy + alpha * xx, y, x)


def norm(a: Pytree):
    """2-norm over all leaves concatenated (reference: Vector.norm contract —
    every application returns the flat 2-norm of its data, e.g.
    heat_2d.py:70-76 Frobenius norm).  DD leaves contribute their rounded
    value hi+lo: the *inputs* to a residual norm need the extended-precision
    cancellation, the norm itself only reports a magnitude."""
    leaves = jax.tree_util.tree_leaves(a, is_leaf=_is_dd)
    sq = sum(jnp.sum(jnp.square(l.to_float() if _is_dd(l) else l)) for l in leaves)
    return jnp.sqrt(sq)


def zeros_like(a: Pytree) -> Pytree:
    """Zero state with the same structure (reference: Vector.clone_zero)."""
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def random_like(a: Pytree, key) -> Pytree:
    """Uniform[0,1) state with the same structure (reference:
    Vector.clone_rand, applications use np.random.rand).  A DD leaf gets a
    uniform hi and zero lo (a valid, renormalized pair)."""
    leaves, treedef = jax.tree_util.tree_flatten(a, is_leaf=_is_dd)
    keys = jax.random.split(key, len(leaves))
    new = []
    for k, leaf in zip(keys, leaves):
        if _is_dd(leaf):
            hi = jax.random.uniform(k, shape=jnp.shape(leaf.hi), dtype=leaf.hi.dtype)
            new.append(_ddm._raw(hi, jnp.zeros_like(hi)))
        else:
            new.append(jax.random.uniform(k, shape=jnp.shape(leaf),
                                          dtype=jnp.result_type(leaf)))
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
    """Scatter-add: tube.at[idx].add(values) on every leaf.  DD leaves go
    through gather -> renormalizing DD add -> scatter-set (a componentwise
    scatter-add would drop the hi rounding error)."""

    def _aa(x, v):
        if _is_dd(x):
            new = _ddm.add(x[idx], v)
            return _ddm._raw(x.hi.at[idx].set(new.hi, mode=mode),
                             x.lo.at[idx].set(new.lo, mode=mode))
        return x.at[idx].add(v, mode=mode)

    return _amap(_aa, tube, values)


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
    """Cast all leaves to the default float dtype (f64 when x64 is on).
    DD leaves keep their float32 pair representation untouched."""
    dt = jnp.zeros(()).dtype
    return _amap(lambda x: x if _is_dd(x) else jnp.asarray(x, dtype=dt), a)
