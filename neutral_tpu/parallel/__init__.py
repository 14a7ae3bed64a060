"""Multi-chip parallelism: device meshes, sharded transport, collectives."""

from .sharding import (ShardedSimulation, make_device_mesh,  # noqa: F401
                       run_timestep_sharded)
