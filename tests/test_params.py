"""Parameter-deck grammar tests."""

import os

import pytest

from neutral_tpu import params as P
from neutral_tpu import config as C

DECK = """\
# comment line
source xpos=0.2 ypos=0.2 width=0.6 height=0.6
problem_0 density=1.0e4 energy=0.0 xpos=0.0 ypos=0.0 width=1.0 height=1.0
problem_1 density=2.5 energy=1.0 xpos=0.4 ypos=0.4 width=0.2 height=0.2
nparticles        10000000  # trailing comment
initial_energy    1.0e3
dt                1.0e-7
nx                4000
ny                4000
iterations        2
visit_dump        0
"""


@pytest.fixture
def deck(tmp_path):
    p = os.path.join(tmp_path, "deck.params")
    with open(p, "w") as f:
        f.write(DECK)
    return p


def test_scalars(deck):
    pf = P.parse_params(deck)
    assert pf.get_int("nparticles") == 10_000_000
    assert pf.get_double("dt") == 1.0e-7
    assert pf.get_int("nx") == 4000
    assert pf.get_int("visit_dump") == 0
    assert pf.get_int("missing", 5) == 5
    with pytest.raises(KeyError):
        pf.get_int("missing")


def test_keyvalue_entries(deck):
    pf = P.parse_params(deck)
    src = dict(pf.get_key_value("source"))
    assert src == {"xpos": 0.2, "ypos": 0.2, "width": 0.6, "height": 0.6}
    probs = pf.problem_entries()
    assert len(probs) == 2
    assert dict(probs[1])["density"] == 2.5


def test_config_loading(deck):
    cfg = C.load_config(deck)
    assert cfg.nx == 4000 and cfg.nparticles == 10_000_000
    assert cfg.source.xpos == 0.2 and cfg.source.height == 0.6
    assert len(cfg.problems) == 2
    assert cfg.problems[0].density == 1.0e4
    # defaults when no arch.params present
    assert cfg.width == 1.0 and cfg.height == 1.0 and cfg.sim_end == 1.0


def test_arch_params_overlay(tmp_path, deck):
    with open(os.path.join(tmp_path, "arch.params"), "w") as f:
        f.write("width 2.0\nheight 3.0\nsim_end 10.0\n")
    cfg = C.load_config(deck)
    assert (cfg.width, cfg.height, cfg.sim_end) == (2.0, 3.0, 10.0)


def test_goldens_lookup(tmp_path):
    p = os.path.join(tmp_path, "scatter.params")
    with open(p, "w") as f:
        f.write(DECK)
    with open(os.path.join(tmp_path, "neutral.tests"), "w") as f:
        f.write("problems/scatter.params result=3.411662060900e-02\n")
    cfg = C.load_config(p)
    assert cfg.expected_tally == pytest.approx(3.411662060900e-02)
