"""Parallel-prefix coarsest-level solve (round-5, beyond the reference).

For steppers that are elementwise-affine in the state (Dahlquist's four
integrators, spectral-basis heat models), ``Mgrit(coarsest_prefix=True)``
replaces the sequential coarsest-level scan (reference
src/pymgrit/core/mgrit.py:459-486) with an EXACT O(log n)-depth
``lax.associative_scan`` over composed affine maps (ops/prefix.py) —
the same chain-breaking AT-MGRIT approximates with truncated windows,
without the truncation.  Histories match the sequential solver to
roundoff by construction.
"""

import numpy as np

from pymgrit_tpu import Dahlquist, Mgrit


def main():
    def build():
        d0 = Dahlquist(t_start=0, t_stop=5, nt=10 * 2 ** 10 + 1)
        d1 = Dahlquist(t_interval=d0.t[::8])   # large coarsest level
        return [d0, d1]

    seq = Mgrit(problem=build(), tol=1e-10)
    info_seq = seq.solve_compiled()

    pfx = Mgrit(problem=build(), tol=1e-10, coarsest_prefix=True)
    info_pfx = pfx.solve_compiled()

    assert np.allclose(info_pfx['conv'], info_seq['conv'], rtol=1e-8), (
        info_pfx['conv'], info_seq['conv'])
    print("prefix coarsest == sequential scan:",
          [f"{c:.6e}" for c in info_pfx['conv']])


if __name__ == '__main__':
    main()
