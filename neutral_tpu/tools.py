"""Utility CLI: `python -m neutral_tpu.tools <command>`.

Commands:
  gen-cs [outdir]        — materialize elastic_scatter.cs / capture.cs from
                           the generating formula (reference resonance.py
                           equivalent; the two files are identical data,
                           as in the reference)
  gen-golden <deck>      — run the native C++ engine on a deck and print a
                           `neutral.tests` golden line for it
  compare <deck>         — run native vs JAX engines on a (small) deck and
                           report tally/event agreement
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def cmd_gen_cs(args) -> int:
    from .constants import CS_CAPTURE_FILENAME, CS_SCATTER_FILENAME
    from .xs import make_resonance_table, write_cs_file

    keys, values = make_resonance_table()
    for name in (CS_SCATTER_FILENAME, CS_CAPTURE_FILENAME):
        path = os.path.join(args.outdir, name)
        write_cs_file(path, keys, values)
        print(f"wrote {path} ({len(keys)} rows)")
    return 0


def cmd_gen_golden(args) -> int:
    from . import native
    from .config import load_config

    cfg = load_config(args.deck)
    if args.nparticles:
        cfg = cfg.with_(nparticles=args.nparticles)
    if args.rng:
        cfg = cfg.with_(rng=args.rng)
    sim = native.NativeSimulation(cfg)
    total = sim.run()
    print(f"{args.deck} result={total:.12e}")
    return 0


def cmd_compare(args) -> int:
    # The agreement contract is exact f64 arithmetic vs the C++ engine, so
    # run the JAX engine on the host CPU even when a TPU is attached (TPU
    # f64 is emulated and the Pallas engine is f32-only).  Must be decided
    # before jax initializes its backends.
    import jax
    jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu":  # backends were already initialized
        print("warning: jax already initialized on an accelerator; "
              "re-run with JAX_PLATFORMS=cpu for the exact-f64 comparison",
              file=sys.stderr)

    from . import native
    from .config import load_config
    from .driver import Simulation

    jax.config.update("jax_enable_x64", True)
    cfg = load_config(args.deck).with_(dtype="float64",
                                       tally_dtype="float64",
                                       engine=args.engine)
    if args.nparticles:
        cfg = cfg.with_(nparticles=args.nparticles)
    if args.mesh_scale:
        cfg = cfg.with_(nx=cfg.nx // args.mesh_scale,
                        ny=cfg.ny // args.mesh_scale)

    nsim = native.NativeSimulation(cfg)
    nat_events = [nsim.step(tt) for tt in range(1, cfg.niters + 1)]
    nat_tally = float(nsim.tally.sum())

    jsim = Simulation(cfg, quiet=True)
    jsim.use_pallas = False
    jax_events = []
    for tt in range(1, cfg.niters + 1):
        m = jsim.step(tt)
        jax_events.append((m.nfacets, m.ncollisions, m.nprocessed))
    jax_tally = float(np.asarray(jsim.tally, np.float64).sum())

    ok = True
    for tt, (ne, je) in enumerate(zip(nat_events, jax_events), 1):
        match = tuple(ne) == tuple(je)
        ok &= match
        print(f"step {tt}: native ev={tuple(ne)} jax ev={tuple(je)} "
              f"{'OK' if match else 'MISMATCH'}")
    rel = abs(nat_tally - jax_tally) / max(abs(nat_tally), 1e-300)
    print(f"tally native={nat_tally:.15e} jax={jax_tally:.15e} rel={rel:.2e}")
    print("AGREE" if ok and rel < 1e-10 else "DISAGREE")
    return 0 if ok and rel < 1e-10 else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="neutral_tpu.tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-cs", help="materialize the .cs data files")
    g.add_argument("outdir", nargs="?", default=".")
    g.set_defaults(fn=cmd_gen_cs)

    g = sub.add_parser("gen-golden", help="golden tally via native engine")
    g.add_argument("deck")
    g.add_argument("--nparticles", type=int, default=None)
    g.add_argument("--rng", default=None, choices=["threefry", "pcg64si"],
                   help="RNG stream scheme (pcg64si: generate goldens for "
                        "the oacc/raja-contract scheme into "
                        "neutral_pcg.tests)")
    g.set_defaults(fn=cmd_gen_golden)

    g = sub.add_parser("compare", help="native vs JAX engine agreement")
    g.add_argument("deck")
    g.add_argument("--nparticles", type=int, default=None)
    g.add_argument("--engine", default="xla", choices=["xla", "flight"],
                   help="JAX engine to compare (flight: the free-flight "
                        "formulation — identical collision RNG streams, "
                        "facet counts from analytic cell crossings)")
    g.add_argument("--mesh-scale", type=int, default=None,
                   help="divide nx/ny (keeps CPU comparisons quick)")
    g.set_defaults(fn=cmd_compare)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
