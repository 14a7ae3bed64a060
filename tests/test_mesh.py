"""Mesh and density-field tests."""

import numpy as np
import jax.numpy as jnp

from neutral_tpu import SimConfig, SourceBox, ProblemRegion, build_mesh
from neutral_tpu.mesh import build_density


def _cfg(**kw):
    base = dict(nx=10, ny=8, width=1.0, height=1.0, source=SourceBox(0, 0, 1, 1))
    base.update(kw)
    return SimConfig(**base)


def test_uniform_edges():
    m = build_mesh(_cfg(), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(m.edgex),
                               np.arange(11) * 0.1, rtol=1e-15)
    np.testing.assert_allclose(np.asarray(m.edgey),
                               np.arange(9) * 0.125, rtol=1e-15)


def test_density_regions_override_in_order():
    cfg = _cfg(problems=(
        ProblemRegion(1.0, 0.0, 0.0, 1.0, 1.0),
        ProblemRegion(5.0, 0.5, 0.0, 0.5, 1.0),
    ))
    d = build_density(cfg)
    assert d.shape == (8, 10)
    # cell centers at (i+0.5)/10: cells 0..4 left, 5..9 right
    assert np.all(d[:, :5] == 1.0)
    assert np.all(d[:, 5:] == 5.0)


def test_density_halfopen_box_semantics():
    # a box [0.4, 0.6) over 10 cells covers exactly cells 4 and 5
    cfg = _cfg(problems=(ProblemRegion(2.0, 0.4, 0.0, 0.2, 1.0),))
    d = build_density(cfg)
    cols = np.where(d[0] == 2.0)[0]
    np.testing.assert_array_equal(cols, [4, 5])


def test_split_problem_layout():
    # the reference's split deck: lower half near-vacuum, upper half dense
    cfg = _cfg(problems=(
        ProblemRegion(1.0e-30, 0.0, 0.0, 1.0, 0.5),
        ProblemRegion(1.0e3, 0.0, 0.5, 1.0, 0.5),
    ))
    d = build_density(cfg)
    assert np.all(d[:4, :] == 1.0e-30)
    assert np.all(d[4:, :] == 1.0e3)
