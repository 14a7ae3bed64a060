"""ctypes bindings for the native host engine (libneutral_native.so).

The native engine is a history-based CPU implementation of the same
physics + RNG stream contract as the JAX event-based engine (see
neutral_native.cpp).  It serves as a fast independent cross-check, a
golden-tally generator for arbitrary decks, and a CPU fallback backend.

Build with `make -C neutral_tpu/native` (auto-attempted on first use).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libneutral_native.so")
_lib = None


class _Particles(ctypes.Structure):
    _fields_ = [
        ("x", ctypes.POINTER(ctypes.c_double)),
        ("y", ctypes.POINTER(ctypes.c_double)),
        ("omega_x", ctypes.POINTER(ctypes.c_double)),
        ("omega_y", ctypes.POINTER(ctypes.c_double)),
        ("energy", ctypes.POINTER(ctypes.c_double)),
        ("weight", ctypes.POINTER(ctypes.c_double)),
        ("dt_to_census", ctypes.POINTER(ctypes.c_double)),
        ("mfp_to_collision", ctypes.POINTER(ctypes.c_double)),
        ("cellx", ctypes.POINTER(ctypes.c_int32)),
        ("celly", ctypes.POINTER(ctypes.c_int32)),
        ("dead", ctypes.POINTER(ctypes.c_int32)),
    ]


def build(force: bool = False) -> bool:
    """Compile the shared library; returns success.

    Always delegates to make — its mtime check makes an up-to-date build a
    no-op, and a stale .so after editing neutral_native.cpp gets rebuilt
    instead of silently loaded.  The binary is never committed; it is a
    build artifact produced on first use.
    """
    try:
        cmd = ["make", "-C", _DIR] + (["-B"] if force else [])
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return os.path.exists(_LIB_PATH)
    except FileNotFoundError:
        # No toolchain: a prebuilt library is still usable if present.
        return os.path.exists(_LIB_PATH)
    except subprocess.CalledProcessError as e:
        # A COMPILE error must not fall back to a stale .so (it would
        # silently run the old binary after an edit) — surface it.
        raise RuntimeError(
            f"native engine build failed:\n{e.stderr or e.stdout}") from e


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        raise RuntimeError(
            "native engine not built; run `make -C neutral_tpu/native`")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nt_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (RuntimeError, OSError):
        return False


def threefry2x64(c0: int, c1: int, k0: int, k1: int) -> tuple[int, int]:
    lib = _load()
    o0 = ctypes.c_uint64()
    o1 = ctypes.c_uint64()
    lib.nt_threefry2x64(ctypes.c_uint64(c0), ctypes.c_uint64(c1),
                        ctypes.c_uint64(k0), ctypes.c_uint64(k1),
                        ctypes.byref(o0), ctypes.byref(o1))
    return o0.value, o1.value


def pcg64si_first(seed: int) -> int:
    """First output of a freshly seeded native PCG64si stream."""
    lib = _load()
    lib.nt_pcg64si_first.restype = ctypes.c_uint64
    return lib.nt_pcg64si_first(ctypes.c_uint64(seed))


def draw2(pid: int, master_key: int, counter: int) -> tuple[float, float]:
    lib = _load()
    r0 = ctypes.c_double()
    r1 = ctypes.c_double()
    lib.nt_draw2(ctypes.c_uint64(pid), ctypes.c_uint64(master_key),
                 ctypes.c_uint64(counter), ctypes.byref(r0), ctypes.byref(r1))
    return r0.value, r1.value


class NativeState:
    """Host-side SoA particle arrays (float64) for the native engine."""

    def __init__(self, n: int):
        self.n = n
        for name in ("x", "y", "omega_x", "omega_y", "energy", "weight",
                     "dt_to_census", "mfp_to_collision"):
            setattr(self, name, np.zeros(n, np.float64))
        self.cellx = np.zeros(n, np.int32)
        self.celly = np.zeros(n, np.int32)
        self.dead = np.zeros(n, np.int32)

    def _struct(self) -> _Particles:
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int32)
        return _Particles(
            *(getattr(self, f).ctypes.data_as(dp)
              for f in ("x", "y", "omega_x", "omega_y", "energy", "weight",
                        "dt_to_census", "mfp_to_collision")),
            self.cellx.ctypes.data_as(ip),
            self.celly.ctypes.data_as(ip),
            self.dead.ctypes.data_as(ip))


class NativeSimulation:
    """Full simulation on the native engine (mirrors driver.Simulation)."""

    def __init__(self, cfg):
        from ..mesh import build_density, build_edges
        from ..xs import find_cs_files, make_resonance_table, read_cs_file

        self.cfg = cfg
        # RNG stream scheme: threefry (omp3/omp4/cuda family) or pcg64si
        # (oacc/raja family) — same selector as the JAX engine (cfg.rng).
        self._scheme = 1 if getattr(cfg, "rng", "threefry") == "pcg64si" else 0
        # density_file grids and user .cs tables load exactly like the
        # JAX driver (reference: neutral_data.c:119-170 loads the .cs
        # pair at init) — the native engine is the independent oracle
        # for table/grid decks, so it must run the SAME inputs.
        self.density = build_density(cfg, dtype=np.float64)
        # Deck-grammar edges (incl. non-uniform: edge files / geometric
        # stretch) — the history loop reads edgex[cellx] directly, so
        # non-uniform meshes need no special casing here.
        self.edgex, self.edgey = build_edges(cfg)
        paths = find_cs_files(getattr(cfg, "params_path", None))
        if paths is not None:
            self.cs_keys, self.cs_vals = read_cs_file(paths[0])
            self.ca_keys, self.ca_vals = read_cs_file(paths[1])
        else:
            self.cs_keys, self.cs_vals = make_resonance_table()
            self.ca_keys, self.ca_vals = self.cs_keys, self.cs_vals
        for name in ("cs_keys", "cs_vals", "ca_keys", "ca_vals"):
            setattr(self, name,
                    np.ascontiguousarray(getattr(self, name), np.float64))
        self.tally = np.zeros(cfg.nx * cfg.ny, np.float64)
        self.state = NativeState(cfg.nparticles)
        lib = _load()
        lib.nt_inject(
            ctypes.c_int64(cfg.nparticles),
            self.edgex.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.edgey.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int(cfg.nx), ctypes.c_int(cfg.ny),
            ctypes.c_double(cfg.source.xpos * cfg.width),
            ctypes.c_double(cfg.source.ypos * cfg.height),
            ctypes.c_double(cfg.source.width * cfg.width),
            ctypes.c_double(cfg.source.height * cfg.height),
            ctypes.c_double(cfg.initial_energy), ctypes.c_double(cfg.dt),
            ctypes.byref(self.state._struct()),
            ctypes.c_int(self._scheme))

    def step(self, tt: int) -> tuple[int, int, int]:
        """One census timestep; returns (nfacets, ncollisions, nprocessed)."""
        lib = _load()
        cfg = self.cfg
        dp = ctypes.POINTER(ctypes.c_double)
        nf = ctypes.c_uint64()
        nc = ctypes.c_uint64()
        npr = ctypes.c_uint64()
        lib.nt_timestep(
            ctypes.c_int64(self.state.n), ctypes.byref(self.state._struct()),
            self.density.ctypes.data_as(dp),
            self.edgex.ctypes.data_as(dp), self.edgey.ctypes.data_as(dp),
            ctypes.c_int(cfg.nx), ctypes.c_int(cfg.ny),
            self.cs_keys.ctypes.data_as(dp), self.cs_vals.ctypes.data_as(dp),
            ctypes.c_int(len(self.cs_keys)),
            self.ca_keys.ctypes.data_as(dp), self.ca_vals.ctypes.data_as(dp),
            ctypes.c_int(len(self.ca_keys)),
            ctypes.c_double(cfg.dt), ctypes.c_uint64(tt),
            ctypes.c_int64(cfg.nparticles),
            self.tally.ctypes.data_as(dp),
            ctypes.byref(nf), ctypes.byref(nc), ctypes.byref(npr),
            ctypes.c_int(self._scheme))
        return nf.value, nc.value, npr.value

    def run(self) -> float:
        for tt in range(1, self.cfg.niters + 1):
            self.step(tt)
        return float(self.tally.sum())
