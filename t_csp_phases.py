import os
os.environ["NEUTRAL_TPU_DEBUG_PHASES"] = "1"
import jax
from neutral_tpu.config import load_config
from neutral_tpu.driver import Simulation
cfg = load_config("problems/csp.params")
sim = Simulation(cfg, quiet=True)
for tt in range(1, 7):
    m = sim.step(tt)
    print(f"step {tt}: {m.step_time:.2f}s { {k: round(v,2) for k,v in (m.phases or {}).items()} }", flush=True)
