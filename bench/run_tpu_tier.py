"""Run the on-hardware test tier and commit the evidence (VERDICT r4 #4).

Runs `pytest tests_tpu -q` on the real chip and writes a JSON record
(pass/fail counts, duration, per-test outcomes, cold-vs-warm caveat) to
TPU_TESTS_r{N}.json at the repo root, so "hardware-validated" claims
point at a committed artifact rather than prose.

    python bench/run_tpu_tier.py --round 5 [pytest args...]

Timing caveat recorded in the artifact: a COLD process (empty executable
cache, fresh tunnel) can take >10 minutes before the first test finishes;
warm it is minutes.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("pytest_args", nargs="*")
    args = ap.parse_args()

    cmd = [sys.executable, "-m", "pytest", "tests_tpu", "-q", "-rA",
           *args.pytest_args]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=HERE, capture_output=True, text=True,
                       timeout=args.timeout)
    dt = time.time() - t0

    # authoritative summary: the final -q tally line
    tally = ""
    for line in reversed(r.stdout.strip().splitlines()):
        if " in " in line and ("passed" in line or "failed" in line
                               or "error" in line or "skipped" in line):
            tally = line.strip().strip("=").strip()
            break

    per_test = {t: w for w, t in re.findall(
        r"^(PASSED|FAILED|SKIPPED|ERROR) (\S+)", r.stdout, re.M)}

    rec = {
        "what": "on-hardware test tier (pytest tests_tpu)",
        "round": args.round,
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "command": " ".join(cmd),
        "returncode": r.returncode,
        "duration_s": round(dt, 1),
        "summary": tally,
        "tests": per_test,
        "timing_caveat": ("cold process (empty executable cache / fresh "
                          "tunnel) can exceed 10 min before the first "
                          "test; warm runs take minutes"),
    }
    out = os.path.join(HERE, f"TPU_TESTS_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps({k: rec[k] for k in
                      ("round", "returncode", "duration_s", "summary")}))
    print(f"wrote {out}")
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:])
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
