"""neutral_tpu — a TPU-native Monte Carlo neutral-particle transport framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the UoB-HPC
`neutral` mini-app (reference mounted at /root/reference): event-based SoA
particle transport with counter-based (Threefry-2x64) RNG streams, vectorized
cross-section lookup, scatter-add tallies, and `jax.sharding`-based
multi-chip scaling.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some hosts ship a TPU plugin that outranks the JAX_PLATFORMS env var
    # in platform selection; honor an explicit request via the config API
    # (must happen before the first device query).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from . import constants  # noqa: F401
from .config import SimConfig, SourceBox, ProblemRegion, load_config  # noqa: F401
from .mesh import Mesh2D, build_mesh  # noqa: F401
from .xs import CrossSection  # noqa: F401
from .particles import ParticleState, inject_particles  # noqa: F401
from .transport import Geometry, EventCounts, run_timestep, event_sweep  # noqa: F401
