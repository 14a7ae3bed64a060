"""Multi-host test worker: one process of a 2-process x 4-device CPU run.

Usage: python _mh_worker.py <process_id> <num_processes> <port>
Prints `RESULT <tally_sum> <nfacets> <ncollisions>` from process 0.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neutral_tpu.parallel import initialise_distributed  # noqa: E402

initialise_distributed(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, jax.devices()

import numpy as np  # noqa: E402

from neutral_tpu import ProblemRegion, SimConfig, SourceBox  # noqa: E402
from neutral_tpu.parallel import ShardedSimulation  # noqa: E402

cfg = SimConfig(nx=32, ny=32, width=1.0, height=1.0, dt=1e-7, niters=2,
                nparticles=64, initial_energy=1.0e3,
                source=SourceBox(0.2, 0.2, 0.6, 0.6),
                problems=(ProblemRegion(1.0e4, 0, 0, 1, 1),),
                dtype="float64", tally_dtype="float64")
sim = ShardedSimulation(cfg, quiet=(pid != 0))
nf = nc = 0
for tt in range(1, cfg.niters + 1):
    m = sim.step(tt)
    nf += m.nfacets
    nc += m.ncollisions
total = float(np.asarray(sim.tally, dtype=np.float64).sum())
if pid == 0:
    print(f"RESULT {total!r} {nf} {nc}", flush=True)

# ---- spatial2d across the process boundary --------------------------------
# The migration ppermute now crosses gloo (the TPU-pod DCN analog);
# a tiny cap_xfer forces multiple flow-controlled rounds per chunk.
# Streaming deck so every particle crosses block boundaries.
from neutral_tpu.parallel import Spatial2DSimulation  # noqa: E402

cfg2 = SimConfig(nx=32, ny=32, width=1.0, height=1.0, dt=1e-7, niters=2,
                 nparticles=96, initial_energy=1.0e6,
                 source=SourceBox(0.3, 0.05, 0.3, 0.2),
                 problems=(ProblemRegion(1.0e-2, 0, 0, 1, 1),),
                 dtype="float64", tally_dtype="float64")
sim2 = Spatial2DSimulation(cfg2, quiet=(pid != 0))
sim2.cap_xfer = 16
nf2 = nc2 = 0
for tt in range(1, cfg2.niters + 1):
    m = sim2.step(tt)
    nf2 += m.nfacets
    nc2 += m.ncollisions
# tally_parts spans non-addressable shards: reduce with a global jnp op
# (legal in multi-controller SPMD) instead of np.asarray.
import jax.numpy as jnp  # noqa: E402

total2 = float(jnp.sum(sim2.tally_parts))
if pid == 0:
    print(f"RESULT2 {total2!r} {nf2} {nc2}", flush=True)

# ---- spatial2d FLIGHT engine across the process boundary ------------------
sim3 = Spatial2DSimulation(cfg2.with_(engine="flight"), quiet=(pid != 0))
nf3 = nc3 = 0
for tt in range(1, cfg2.niters + 1):
    m = sim3.step(tt)
    nf3 += m.nfacets
    nc3 += m.ncollisions
total3 = float(jnp.sum(sim3.tally_parts))
if pid == 0:
    print(f"RESULT3 {total3!r} {nf3} {nc3}", flush=True)
