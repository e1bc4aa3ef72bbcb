"""Device-mesh sharding + host-level communication layer.

The reference scales out with MPI (pickled objects over mpi4py,
pecos/distributed/comm) and OpenMP inside kernels (SURVEY.md §2.4).  The TPU
design replaces both with a single mesh abstraction: jax collectives over ICI
within a slice, DCN across slices; a DistComm-shaped host object layer for
control-plane messages.
"""

from .mesh import make_mesh, shard_solve_block  # noqa: F401
from .comm import DistComm, DummyComm  # noqa: F401
