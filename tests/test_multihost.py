"""Multi-host (multi-process) execution: the TPU-pod analog of the
reference's MPI launch (main.c:62-64).

Two subprocesses x 4 virtual CPU devices each form an 8-device global
mesh via jax.distributed + gloo collectives; the SAME shard_map programs
run across the process boundary.  The pid-keyed RNG makes the result
bitwise-identical to the single-process 8-device run of this test
session, which is the assertion.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from neutral_tpu import ProblemRegion, SimConfig, SourceBox

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_cfgs():
    replicated = SimConfig(
        nx=32, ny=32, width=1.0, height=1.0, dt=1e-7, niters=2,
        nparticles=64, initial_energy=1.0e3,
        source=SourceBox(0.2, 0.2, 0.6, 0.6),
        problems=(ProblemRegion(1.0e4, 0, 0, 1, 1),),
        dtype="float64", tally_dtype="float64")
    streaming = SimConfig(
        nx=32, ny=32, width=1.0, height=1.0, dt=1e-7, niters=2,
        nparticles=96, initial_energy=1.0e6,
        source=SourceBox(0.3, 0.05, 0.3, 0.2),
        problems=(ProblemRegion(1.0e-2, 0, 0, 1, 1),),
        dtype="float64", tally_dtype="float64")
    return replicated, streaming


def _run_counts(sim, niters):
    total = sim.run()   # same full driver surface the workers exercise
    nf = sum(m.nfacets for m in sim.step_metrics)
    nc = sum(m.ncollisions for m in sim.step_metrics)
    return float(total), nf, nc


def _single_process_reference():
    """(replicated, spatial2d stepping, spatial2d flight) references."""
    from neutral_tpu.parallel import ShardedSimulation, Spatial2DSimulation
    replicated, streaming = _worker_cfgs()
    out = [_run_counts(ShardedSimulation(replicated, quiet=True), 2)]
    sp = Spatial2DSimulation(streaming, quiet=True)
    sp.cap_xfer = 16
    out.append(_run_counts(sp, 2))
    out.append(_run_counts(
        Spatial2DSimulation(streaming.with_(engine="flight"), quiet=True),
        2))
    return out


@pytest.mark.slow
def test_two_process_matches_single_process():
    """2 processes x 4 devices == single-process 8 devices, bitwise.

    Covers the replicated stepping engine AND the spatial2d paths whose
    migration ppermute crosses the gloo process boundary (the TPU-pod
    DCN analog) — stepping with a tiny forced-backlog cap_xfer, and the
    free-flight engine.
    """
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    worker = os.path.join(_HERE, "_mh_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    refs = _single_process_reference()
    for i, tag in enumerate(["RESULT ", "RESULT2 ", "RESULT3 "]):
        lines = [l for l in outs[0].splitlines() if l.startswith(tag)]
        assert lines, f"no {tag}line:\n{outs[0]}"
        _, total, nf, nc = lines[0].split()
        ref_total, ref_nf, ref_nc = refs[i]
        # pid-keyed RNG: same 8 shards -> same histories -> equal counts
        assert (int(nf), int(nc)) == (ref_nf, ref_nc), tag
        np.testing.assert_allclose(float(total), ref_total, rtol=1e-12)
