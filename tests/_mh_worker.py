"""Multi-host test worker: one process of a 2-process x 4-device CPU run.

Usage: python _mh_worker.py <process_id> <num_processes> <port>
Prints `RESULT <tally_sum> <nfacets> <ncollisions>` from process 0.

Each simulation runs through the FULL driver surface — sim.run() (the
timestep loop + metric prints + validate) — not a hand-rolled step loop,
so the whole reference contract (main.c:85-156: solve, gather, output,
validation) is exercised across the process boundary.  The second case
additionally runs visit dumps and a checkpoint (collective gathers +
process-0 writes) into a temp directory.
"""
import os
import sys
import tempfile

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

from neutral_tpu import ProblemRegion, SimConfig, SourceBox  # noqa: E402
from neutral_tpu.parallel import (ShardedSimulation,  # noqa: E402
                                  Spatial2DSimulation)


def run_and_report(sim, niters, tag):
    total = sim.run()          # full driver loop incl. validate()
    nf = sum(m.nfacets for m in sim.step_metrics)
    nc = sum(m.ncollisions for m in sim.step_metrics)
    if pid == 0:
        print(f"{tag} {float(total)!r} {nf} {nc}", flush=True)
    return total


cfg = SimConfig(nx=32, ny=32, width=1.0, height=1.0, dt=1e-7, niters=2,
                nparticles=64, initial_energy=1.0e3,
                source=SourceBox(0.2, 0.2, 0.6, 0.6),
                problems=(ProblemRegion(1.0e4, 0, 0, 1, 1),),
                dtype="float64", tally_dtype="float64")
run_and_report(ShardedSimulation(cfg, quiet=True), cfg.niters, "RESULT")

# ---- spatial2d across the process boundary --------------------------------
# The migration ppermute crosses gloo (the TPU-pod DCN analog); a tiny
# cap_xfer forces multiple flow-controlled rounds per chunk.  Streaming
# deck so every particle crosses block boundaries.  visit_dump exercises
# the collective gather + process-0 BOV writes (main.c:129-139 analog),
# in a per-process temp cwd so test runs leave no droppings.
cfg2 = SimConfig(nx=32, ny=32, width=1.0, height=1.0, dt=1e-7, niters=2,
                 nparticles=96, initial_energy=1.0e6,
                 source=SourceBox(0.3, 0.05, 0.3, 0.2),
                 problems=(ProblemRegion(1.0e-2, 0, 0, 1, 1),),
                 dtype="float64", tally_dtype="float64", visit_dump=True)
tmp = tempfile.mkdtemp(prefix=f"mh{pid}_")
os.chdir(tmp)
sim2 = Spatial2DSimulation(cfg2, quiet=True)
sim2.cap_xfer = 16
run_and_report(sim2, cfg2.niters, "RESULT2")
sim2.checkpoint(os.path.join(tmp, "mh.npz"), cfg2.niters)  # collective
if pid == 0:
    assert os.path.isfile(os.path.join(tmp, "mh.npz")), "checkpoint missing"
    assert os.path.isfile("energy2.bov"), "visit dump missing"

# ---- spatial2d FLIGHT engine across the process boundary ------------------
run_and_report(
    Spatial2DSimulation(cfg2.with_(engine="flight", visit_dump=False),
                        quiet=True),
    cfg2.niters, "RESULT3")
