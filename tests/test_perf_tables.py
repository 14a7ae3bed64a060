"""Published performance tables must match the latest bench capture.

VERDICT r4 weak #2: README/BASELINE throughput tables were hand-edited
and drifted from the driver-captured BENCH_r*.json two rounds in a row.
bench/gen_perf_tables.py makes them mechanical; this test fails the
suite whenever the committed tables are stale.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_perf_tables_not_stale():
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench", "gen_perf_tables.py"),
         "--check"],
        capture_output=True, text=True)
    assert r.returncode == 0, (
        f"performance tables drifted from the bench capture:\n{r.stderr}")


def test_render_is_deterministic_and_marked():
    sys.path.insert(0, os.path.join(HERE, "bench"))
    import gen_perf_tables as g

    src, recs = g.latest_bench()
    block = g.render(src, recs)
    assert block == g.render(src, recs)
    assert block.startswith(g.BEGIN) and block.endswith(g.END)
    # all four headline decks present in a usable capture
    for deck in g.DECKS:
        assert f"| {deck} |" in block, f"{deck} row missing (source {src})"
