"""Device-mesh sharding layer.

Replaces the reference's MPI distribution (caput.mpiarray; SURVEY.md L3)
with jax.sharding over a device Mesh: the MPIArray ``redistribute(axis=…)``
global transposes become sharding constraints inside one jitted program and
XLA inserts the all-to-all collectives over ICI.
"""

from .checkpoint import (  # noqa: F401
    abstract_like,
    load_container,
    restore_sharded,
    save_container,
    save_sharded,
)
from .distributed import initialize, make_pod_mesh  # noqa: F401
from .mesh import (  # noqa: F401
    make_mesh,
    mkfullsky_sharded,
    synthesize_cube_sharded,
    synthesize_cube_sims_sharded,
    shard_over,
    redistribute,
)
