"""On-hardware TPU smoke tier (VERDICT r3 item 5).

Unlike tests/ (which pins an 8-virtual-device CPU backend), this suite
runs on the REAL chip: each Mosaic kernel against its XLA twin, in
minutes — so kernel regressions are caught by tests rather than by bench
archaeology.  Run with:

    python -m pytest tests_tpu -q

The whole tier skips (rather than hangs) when no TPU backend answers —
the axon tunnel can wedge hard enough that even jax.devices() blocks,
so the probe runs in a subprocess with a timeout (same trick as
bench._probe_device).
"""

import os
import subprocess
import sys

import pytest

# Persistent executable cache (see bench.py): Mosaic compiles through
# the axon tunnel cost minutes each; cold-start of this tier drops from
# >10 min to ~2 min once the cache is warm.  Set before jax init.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

_probe_result = None


def _tpu_alive(timeout_s: int = 180) -> bool:
    global _probe_result
    if _probe_result is None:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                timeout=timeout_s, capture_output=True, text=True)
            _probe_result = (r.returncode == 0
                             and r.stdout.strip().endswith("tpu"))
        except subprocess.TimeoutExpired:
            _probe_result = False
    return _probe_result


def pytest_collection_modifyitems(config, items):
    for it in items:
        it.add_marker(pytest.mark.tpu)


def pytest_runtest_setup(item):
    if not _tpu_alive():
        pytest.skip("no TPU backend reachable (tests_tpu needs real "
                    "hardware; the CPU battery in tests/ is the "
                    "correctness oracle)")
