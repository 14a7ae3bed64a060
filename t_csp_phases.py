import os
os.environ["NEUTRAL_TPU_DEBUG_PHASES"] = "1"
import jax
from neutral_tpu.config import load_config
from neutral_tpu.driver import Simulation
cfg = load_config("problems/csp.params")
for p in range(2):
    sim = Simulation(cfg, quiet=True)
    for tt in range(1, 7):
        m = sim.step(tt)
        if p:
            print(f"P2 step {tt}: {m.step_time:.2f}s { {k: round(v,2) for k,v in (m.phases or {}).items()} }", flush=True)
