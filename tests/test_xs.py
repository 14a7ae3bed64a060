"""Cross-section table tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from neutral_tpu import xs


def test_resonance_table_matches_generator_formula():
    k, v = xs.make_resonance_table()
    assert k.shape == (29999,)
    assert np.isclose(k[0], 1.000000012347e-02, rtol=1e-9)
    assert np.isclose(v[0], 1.001e3, rtol=1e-12)
    assert np.isclose(k[-1], 1.000000000100e+08, rtol=1e-12)
    assert np.isclose(v[-1], 1.033334444481e+00, rtol=1e-9)
    assert np.all(np.diff(k) > 0)


def test_file_roundtrip(tmp_path):
    k, v = xs.make_resonance_table(n=100)
    p = os.path.join(tmp_path, "t.cs")
    xs.write_cs_file(p, k, v)
    k2, v2 = xs.read_cs_file(p)
    np.testing.assert_allclose(k2, k, rtol=1e-12)
    np.testing.assert_allclose(v2, v, rtol=1e-12)


def test_quartic_index_matches_searchsorted():
    tab = xs.CrossSection.resonance(dtype=jnp.float64)
    assert tab.quartic
    linear = xs.CrossSection(tab.keys, tab.values, quartic=False)
    rs = np.random.RandomState(1)
    e = jnp.asarray(10.0 ** rs.uniform(-1.9, 7.9, size=5000))
    np.testing.assert_array_equal(np.asarray(tab.lookup_index(e)),
                                  np.asarray(linear.lookup_index(e)))
    np.testing.assert_allclose(np.asarray(tab.lookup(e)),
                               np.asarray(linear.lookup(e)), rtol=1e-14)


def test_lookup_matches_scalar_reference_interp():
    tab = xs.CrossSection.resonance(dtype=jnp.float64)
    k = np.asarray(tab.keys)
    v = np.asarray(tab.values)
    for e in (1.0, 1e3, 2.5e4, 1e6, 0.5, 9.9e7):
        ind = int(np.searchsorted(k, e, side="right")) - 1
        expect = v[ind] + ((e - k[ind]) / (k[ind + 1] - k[ind])) * (v[ind + 1] - v[ind])
        got = float(tab.lookup(jnp.asarray([e], jnp.float64))[0])
        assert got == pytest.approx(expect, rel=1e-14)


def test_exact_key_energies_bracket_left():
    tab = xs.CrossSection.resonance(dtype=jnp.float64)
    k = np.asarray(tab.keys)
    e = jnp.asarray(k[[5, 100, 20000]])
    idx = np.asarray(tab.lookup_index(e))
    np.testing.assert_array_equal(idx, [5, 100, 20000])


def test_quartic_detection_from_file(tmp_path):
    k, v = xs.make_resonance_table()
    p = os.path.join(tmp_path, "gen.cs")
    xs.write_cs_file(p, k, v)
    tab = xs.CrossSection.from_file(p, dtype=jnp.float64)
    assert tab.quartic
    # a generic table is not flagged
    p2 = os.path.join(tmp_path, "gen2.cs")
    xs.write_cs_file(p2, np.array([1.0, 2.0, 4.0]), np.array([1.0, 2.0, 3.0]))
    tab2 = xs.CrossSection.from_file(p2, dtype=jnp.float64)
    assert not tab2.quartic
