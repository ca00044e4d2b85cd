"""Cross-validation battery: run the live reference PyMGRIT (serial, under
the mpi4py stub) and pymgrit_tpu on the *same* configurations and compare
full residual histories.  Extends parity beyond the published goldens to
arbitrary cycle/relaxation/criterion combinations (the TOMS example 1
matrix: V/F cycles x F/FCF/FCFCF relaxation, reference
examples/toms/example_1_heat1d.py)."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "tools", "mpi4py_stub"))
sys.path.insert(0, "/root/reference/src")


def _ref_heat1d(nts, nx=33, x_end=1.0):
    from pymgrit.heat.heat_1d import Heat1D as RefHeat1D

    def rhs(x, t):
        return -np.sin(np.pi * x) * (np.sin(t) - np.pi ** 2 * np.cos(t))

    def ic(x):
        return np.sin(np.pi * x)

    return [RefHeat1D(x_start=0, x_end=x_end, nx=nx, a=1, rhs=rhs, init_cond=ic,
                      t_start=0, t_stop=2, nt=nt) for nt in nts]


def _our_heat1d(nts, nx=33, x_end=1.0):
    from pymgrit_tpu import Heat1D

    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - jnp.pi ** 2 * jnp.cos(t))

    def ic(x):
        return np.sin(np.pi * x)

    return [Heat1D(x_start=0, x_end=x_end, nx=nx, a=1, rhs=rhs, init_cond=ic,
                   t_start=0, t_stop=2, nt=nt) for nt in nts]


CONFIGS = [
    dict(cycle_type='V', cf_iter=0),
    dict(cycle_type='V', cf_iter=2),
    dict(cycle_type='F', cf_iter=0),
    dict(cycle_type='F', cf_iter=2),
    dict(cycle_type='V', cf_iter=1, weight_c=1.3),
    dict(cycle_type='V', cf_iter=1, nested_iteration=False),
    dict(cycle_type='V', cf_iter=1, conv_crit=1),
    dict(cycle_type='V', cf_iter=1, t_norm=3),
    dict(cycle_type='V', cf_iter=[2, 1, 1], nested_iteration=False),
]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=[str(sorted(c.items())) for c in CONFIGS])
def test_heat1d_history_matches_reference(cfg):
    from pymgrit.core.mgrit import Mgrit as RefMgrit
    from pymgrit_tpu import Mgrit

    nts = (65, 17, 5)
    kw = dict(tol=1e-9, max_iter=12, logging_lvl=30)
    ref_cfg = {k: (list(v) if isinstance(v, list) else v) for k, v in cfg.items()}
    ref = RefMgrit(problem=_ref_heat1d(nts), **ref_cfg, **kw)
    ref_conv = ref.solve()['conv']

    ours = Mgrit(problem=_our_heat1d(nts), **cfg, **kw)
    our_conv = ours.solve()['conv']

    # The reference filters exactly-zero residuals out of the returned
    # history (mgrit.py:645), so a roundoff-zero final iterate can make
    # lengths differ by one; the overlapping prefix must match exactly.
    n = min(len(ref_conv), len(our_conv))
    assert abs(len(ref_conv) - len(our_conv)) <= 1, (ref_conv, our_conv)
    if len(our_conv) > n:
        assert our_conv[-1] < 1e-12
    if len(ref_conv) > n:
        assert ref_conv[-1] < 1e-12
    np.testing.assert_allclose(our_conv[:n], ref_conv[:n], rtol=1e-6, atol=1e-12)


def test_dahlquist_methods_cross():
    from pymgrit.core.mgrit import Mgrit as RefMgrit
    from pymgrit.dahlquist.dahlquist import Dahlquist as RefDahlquist
    from pymgrit_tpu import Mgrit, Dahlquist

    for method in ('FE', 'TR', 'MR'):
        ref = RefMgrit(problem=[RefDahlquist(t_start=0, t_stop=5, nt=65, method=method),
                                RefDahlquist(t_start=0, t_stop=5, nt=17, method=method)],
                       tol=1e-10, logging_lvl=30)
        ref_conv = ref.solve()['conv']
        ours = Mgrit(problem=[Dahlquist(t_start=0, t_stop=5, nt=65, method=method),
                              Dahlquist(t_start=0, t_stop=5, nt=17, method=method)],
                     tol=1e-10, logging_lvl=30)
        our_conv = ours.solve()['conv']
        assert len(ref_conv) == len(our_conv)
        np.testing.assert_allclose(our_conv, ref_conv, rtol=1e-6, atol=1e-13)


def test_advection_cross():
    from pymgrit.core.mgrit import Mgrit as RefMgrit
    from pymgrit.advection.advection_1d import Advection1D as RefAdv
    from pymgrit_tpu import Mgrit, Advection1D

    ref = RefMgrit(problem=[RefAdv(c=1, x_start=-1, x_end=1, nx=65, t_start=0, t_stop=2, nt=65),
                            RefAdv(c=1, x_start=-1, x_end=1, nx=65, t_start=0, t_stop=2, nt=33)],
                   nested_iteration=False, tol=1e-8, logging_lvl=30)
    ref_conv = ref.solve()['conv']
    ours = Mgrit(problem=[Advection1D(c=1, x_start=-1, x_end=1, nx=65, t_start=0, t_stop=2, nt=65),
                          Advection1D(c=1, x_start=-1, x_end=1, nx=65, t_start=0, t_stop=2, nt=33)],
                 nested_iteration=False, tol=1e-8, logging_lvl=30)
    our_conv = ours.solve()['conv']
    assert len(ref_conv) == len(our_conv)
    np.testing.assert_allclose(our_conv, ref_conv, rtol=1e-6, atol=1e-12)


def test_bench_config_cross():
    """The bench configuration's history, measured live from the reference
    (BENCH_BASELINE_CACHE.json): 5 iterations to 8.74e-8."""
    import json
    import bench as bench_mod
    from pymgrit_tpu import Mgrit

    with open(os.path.join(REPO, "BENCH_BASELINE_CACHE.json")) as f:
        ref = json.load(f)
    if "steps_per_sec" not in ref:        # round-2 cache: dict per config
        ref = ref["base65"]
    cfg = bench_mod.CONFIGS["base65"]
    problem = bench_mod.build_problem(nx=cfg["nx"], ny=cfg["ny"],
                                      nt=cfg["nt"], ms=cfg["ms"])
    m = Mgrit(problem=problem, tol=1e-7, max_iter=10, logging_lvl=30)
    conv = m.solve_compiled()['conv']
    assert len(conv) == ref["iterations"]
    np.testing.assert_allclose(conv, ref["conv"], rtol=1e-4)
