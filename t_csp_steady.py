import time
import jax
from neutral_tpu.config import load_config
from neutral_tpu.driver import Simulation

cfg = load_config("problems/csp.params")
sim = Simulation(cfg, quiet=True)
for tt in range(1, 11):
    m = sim.step(tt)
    print(f"step {tt}: {m.step_time:.2f}s phases={ {k: round(v,2) for k,v in (m.phases or {}).items()} }", flush=True)
# second pass in the SAME process: true steady state
sim2 = Simulation(cfg, quiet=True)
for tt in range(1, 11):
    m = sim2.step(tt)
    print(f"PASS2 step {tt}: {m.step_time:.2f}s phases={ {k: round(v,2) for k,v in (m.phases or {}).items()} }", flush=True)
