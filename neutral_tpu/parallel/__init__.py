"""Multi-chip parallelism: device meshes, sharded transport, collectives."""

from .sharding import (ShardedSimulation, initialise_distributed,  # noqa: F401
                       make_device_mesh, run_timestep_sharded)
from .spatial import (SpatialSimulation,  # noqa: F401
                      Spatial2DSimulation)
