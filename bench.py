"""Benchmark: event throughput on all four reference problems.

Runs each shipped deck (scatter / stream / csp / split) end-to-end on the
available device(s), validates the tally, and prints one JSON line per
deck followed by a final headline line (the driver records the LAST line):

    {"metric": "scatter_events_per_s", "value": N, ..., "problems": {...}}

`vs_baseline` compares against the reference omp3 backend measured on
this machine's CPU (BASELINE.md; the reference repo publishes no numbers).
csp note: the shipped golden is a statistical outlier that the reference's
own omp3 backend misses by 1.5e-3 (BASELINE.md) — csp validates against
omp3's converged value instead, with the golden deviation also reported.

Methodology: one warmup pass per deck runs the identical shapes so
trace/compile cost (executables are disk-cached, but tracing is
per-process) stays out of the measured pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Persistent XLA/Mosaic executable cache: compiles through the axon
# tunnel run ~3-4 min per big kernel; the cache cuts every later
# process's warmup to seconds.  Must be set before jax initializes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(
                          __file__)), ".jax_cache"))

# Reference omp3 (GCC -O3 -march=native, this machine's 1-core CPU) —
# events/s measured in BASELINE.md (split: 1.068e9 events in 110.76 s,
# 2026-08-17).
BASELINES = {
    "scatter": 5.17e6,
    "stream": 1.14e7,
    "csp": 1.35e7,
    "split": 9.65e6,
}

# omp3's own csp tally on this machine (BASELINE.md): the acceptance
# anchor for csp instead of the outlier golden.
CSP_OMP3_TALLY = 1.120146418000e+07


def run_problem(cfg, n_dev, decomposition="replicated"):
    """Run all steps of a config; returns (events, solve_seconds, tally)."""
    import numpy as np

    if decomposition == "spatial2d":
        from neutral_tpu.parallel import Spatial2DSimulation
        sim = Spatial2DSimulation(cfg, quiet=True)
    elif n_dev > 1:
        from neutral_tpu.parallel import ShardedSimulation
        sim = ShardedSimulation(cfg, quiet=True)
    else:
        from neutral_tpu.driver import Simulation
        sim = Simulation(cfg, quiet=True)

    # Construction work must not land in step-1 timing — the spatial
    # drivers upload the owner-partitioned state (tens of MB, ~40 MB/s
    # through the axon tunnel) asynchronously, and block_until_ready is
    # a no-op there; a tiny read is the reliable sync.
    import jax
    leaf = jax.tree_util.tree_leaves(sim.state)[0]
    np.asarray(leaf.reshape(-1)[:1])

    events = 0
    solve_time = 0.0
    for tt in range(1, cfg.niters + 1):
        t0 = time.perf_counter()
        m = sim.step(tt)
        solve_time += time.perf_counter() - t0
        events += m.nfacets + m.ncollisions
    tally = float(np.asarray(sim.tally, dtype=np.float64).sum())
    return events, solve_time, tally


def bench_deck(name: str, here: str, n_dev: int,
               decomposition: str = "replicated",
               rng: str = "threefry") -> dict:
    import dataclasses

    from neutral_tpu.config import load_config
    from neutral_tpu.constants import VALIDATE_TOLERANCE

    deck_path = os.path.join(here, "problems", f"{name}.params")
    cfg = load_config(deck_path)
    if rng != "threefry":
        # Scheme-specific golden (problems/neutral_pcg.tests, generated
        # at full deck scale by the native engine): RNG schemes are
        # independent statistical realizations, so validating a pcg run
        # against the threefry golden makes correct code "fail" at 1M
        # particles (round-4 split_pcg shipped validated=false that way).
        from neutral_tpu.config import _find_expected_tally
        cfg = dataclasses.replace(
            cfg, rng=rng,
            expected_tally=_find_expected_tally(deck_path, rng=rng))

    # One retry covers a transient remote-TPU drop; the first failure is
    # logged so a deterministic bug that passes on retry stays visible.
    for attempt in range(2):
        try:
            # warmup: trace + compile all shapes
            run_problem(cfg, n_dev, decomposition)
            events, solve_time, tally_sum = run_problem(cfg, n_dev,
                                                        decomposition)
            break
        except Exception:
            import traceback
            print(f"bench[{name}] attempt {attempt + 1} failed:",
                  file=sys.stderr)
            traceback.print_exc()
            if attempt == 1:
                raise
            time.sleep(60)

    expected = cfg.expected_tally
    rel_err = (abs(tally_sum - expected) / abs(expected)
               if expected else float("nan"))
    validated = bool(expected) and rel_err < VALIDATE_TOLERANCE
    tag = "" if decomposition == "replicated" else f"_{decomposition}"
    if rng != "threefry":
        tag += f"_{rng.replace('64si', '')}"
    rec = {
        "metric": f"{name}{tag}_events_per_s",
        "value": events / solve_time,
        "unit": "events/s",
        "tally_rel_err": rel_err,
        "validated": validated,
        "events": events,
        "solve_time_s": solve_time,
    }
    if name == "csp" and rng == "threefry":
        # The shipped csp golden is a statistical outlier (BASELINE.md);
        # the threefry record validates against the reference omp3
        # backend's own tally.  pcg csp has its own native-engine golden.
        rel_omp3 = abs(tally_sum - CSP_OMP3_TALLY) / CSP_OMP3_TALLY
        rec["tally_rel_err_vs_omp3"] = rel_omp3
        rec["validated"] = bool(rel_omp3 < VALIDATE_TOLERANCE)
    base = BASELINES.get(name)
    rec["vs_baseline"] = (rec["value"] / base) if base else None
    return rec


def _probe_device(timeout_s: int = 300) -> bool:
    """True when the device backend answers within timeout_s.

    The axon TPU tunnel can wedge so hard that even jax.devices() blocks
    forever in-process; probing in a SUBPROCESS with a timeout lets the
    bench emit a recorded error line instead of hanging the driver.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(int(jnp.arange(4).sum()))"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "6" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    os.chdir(here)
    sys.path.insert(0, here)

    if not _probe_device():
        err = {"metric": "error", "value": 0, "unit": "events/s",
               "vs_baseline": 0,
               "error": "device backend unreachable (tunnel down?) — "
                        "no benchmark was run"}
        print(json.dumps(err), flush=True)
        return 1

    import jax

    n_dev = len(jax.devices())
    results = {}
    decks = sys.argv[1:] or ("scatter", "stream", "csp", "split")
    for name in decks:
        rec = bench_deck(name, here, n_dev)
        rec["n_devices"] = n_dev
        results[name] = rec
        print(json.dumps(rec), flush=True)

    # Spatial-decomposition datapoints (VERDICT r2 item 1): the flight
    # engine under the 2D block decomposition, same validation gates.
    if not sys.argv[1:]:
        for name in ("csp", "stream"):
            rec = bench_deck(name, here, n_dev, decomposition="spatial2d")
            rec["n_devices"] = n_dev
            rec["slowdown_vs_replicated"] = (results[name]["value"]
                                             / max(rec["value"], 1e-9))
            results[f"{name}_spatial2d"] = rec
            print(json.dumps(rec), flush=True)

        # The oacc/raja RNG scheme (pcg64si — reference contract
        # oacc/neutral.c:710-719; ~2x fewer u32 ALU ops per pair draw
        # than threefry-2x64/20) on every deck.  Same goldens, same
        # tolerance; threefry stays the default for omp3 stream parity.
        for name in decks:
            rec = bench_deck(name, here, n_dev, rng="pcg64si")
            rec["n_devices"] = n_dev
            rec["speedup_vs_threefry"] = (rec["value"]
                                          / max(results[name]["value"],
                                                1e-9))
            results[f"{name}_pcg"] = rec
            print(json.dumps(rec), flush=True)

    head = dict(results[decks[0]])
    head["problems"] = {k: {kk: vv for kk, vv in v.items()
                            if kk != "problems"}
                        for k, v in results.items()}
    print(json.dumps(head), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
