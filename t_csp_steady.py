import time
import jax
from neutral_tpu.config import load_config
from neutral_tpu.driver import Simulation

cfg = load_config("problems/csp.params")
for p in range(2):
    sim = Simulation(cfg, quiet=True)
    tag = "PASS2" if p else "warm"
    for tt in range(1, 11):
        m = sim.step(tt)
        print(f"{tag} step {tt}: {m.step_time:.2f}s phases={ {k: round(v,2) for k,v in (m.phases or {}).items()} }", flush=True)
