"""Minimal serial mpi4py stand-in (rank 0, size 1).

Lets the reference PyMGRIT run single-process in this container (mpi4py is
not installed) so bench.py can measure live reference baselines and tests
can generate golden histories for arbitrary configs.  Only the API surface
the reference's serial code path touches is provided.
"""

from . import MPI  # noqa: F401  (reference imports `from mpi4py import MPI`)
