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


def _single_process_reference():
    from neutral_tpu.parallel import ShardedSimulation
    cfg = SimConfig(nx=32, ny=32, width=1.0, height=1.0, dt=1e-7, niters=2,
                    nparticles=64, initial_energy=1.0e3,
                    source=SourceBox(0.2, 0.2, 0.6, 0.6),
                    problems=(ProblemRegion(1.0e4, 0, 0, 1, 1),),
                    dtype="float64", tally_dtype="float64")
    sim = ShardedSimulation(cfg, quiet=True)
    nf = nc = 0
    for tt in range(1, cfg.niters + 1):
        m = sim.step(tt)
        nf += m.nfacets
        nc += m.ncollisions
    return float(np.asarray(sim.tally, np.float64).sum()), nf, nc


@pytest.mark.slow
def test_two_process_matches_single_process():
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
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    result = [l for l in outs[0].splitlines() if l.startswith("RESULT ")]
    assert result, f"no RESULT line:\n{outs[0]}"
    _, total, nf, nc = result[0].split()
    total, nf, nc = float(total), int(nf), int(nc)

    ref_total, ref_nf, ref_nc = _single_process_reference()
    # pid-keyed RNG: same 8 shards -> same histories -> identical counts
    assert (nf, nc) == (ref_nf, ref_nc)
    np.testing.assert_allclose(total, ref_total, rtol=1e-12)
