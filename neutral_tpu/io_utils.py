"""Output + checkpoint IO.

* BOV (Brick-of-Values) dumps readable by VisIt/ParaView — the TPU-native
  replacement for the arch harness's `write_all_ranks_to_visit` (reference
  call sites: main.c:129-139,194-198; the reference emits .bov/.dat pairs,
  see its .gitignore).  In sharded runs the caller gathers the global grid
  first (one all_gather of a small 2D field), so a single rank writes.

* Particle-density histogram — reference: plot_particle_density
  (main.c:169-200), a per-cell count of particle positions.

* Checkpoint/resume — a capability the reference lacks entirely (SURVEY §5):
  census semantics mean the full simulation state is just the particle SoA
  pytree + tally + timestep index, so a single compressed .npz per step
  round-trips a run exactly (bitwise: counter-based RNG streams are keyed by
  (pid, timestep), so resuming at step k replays identically).
"""

from __future__ import annotations

import os

import numpy as np

from .particles import ParticleState


def host_global(x) -> np.ndarray:
    """Host numpy copy of the GLOBAL value of a (possibly sharded) array.

    In multi-process runs (jax.distributed — the TPU-pod analog of the
    reference's MPI launch, main.c:62-64) device arrays span shards other
    processes own; `np.asarray` on those raises.  This gathers the full
    value to every process first (XLA all-gather over ICI/DCN), which is
    the SPMD-legal equivalent of the reference's rank-gathering output
    path (write_all_ranks_to_visit, main.c:129-139).  COLLECTIVE: every
    process must call it at the same point.  Fully-addressable arrays
    (the common single-process case) take the plain `np.asarray` path.
    """
    if not hasattr(x, "is_fully_addressable") or x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    # tiled=True is required for global (non-fully-addressable) inputs;
    # the result is the fully-replicated global value as np.ndarray.
    return multihost_utils.process_allgather(x, tiled=True)


# ---------------------------------------------------------------------------
# BOV dumps
# ---------------------------------------------------------------------------

def write_bov(basename: str, data: np.ndarray, *, variable: str,
              time: float = 0.0) -> None:
    """Write `<basename>.bov` + `<basename>.dat` for a (ny, nx) field."""
    arr = np.asarray(data)
    if arr.ndim != 2:
        raise ValueError(f"BOV writer expects a 2D field, got {arr.shape}")
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    ny, nx = arr.shape
    datfile = basename + ".dat"
    arr.tofile(datfile)
    with open(basename + ".bov", "w") as f:
        f.write(f"TIME: {time}\n")
        f.write(f"DATA_FILE: {os.path.basename(datfile)}\n")
        f.write(f"DATA_SIZE: {nx} {ny} 1\n")
        f.write("DATA_FORMAT: DOUBLE\n")
        f.write(f"VARIABLE: {variable}\n")
        f.write("DATA_ENDIAN: LITTLE\n")
        f.write("CENTERING: zone\n")
        f.write("BRICK_ORIGIN: 0. 0. 0.\n")
        f.write(f"BRICK_SIZE: {nx}. {ny}. 1.\n")


def particle_density(state: ParticleState, nx: int, ny: int) -> np.ndarray:
    """Per-cell count of live particles (host-side numpy histogram).

    Collective in multi-process runs (host_global gathers the sharded
    cell/dead arrays): call from every process, write from one.
    """
    cellx = host_global(state.cellx)
    celly = host_global(state.celly)
    dead = host_global(state.dead)
    live = ~dead
    flat = celly[live].astype(np.int64) * nx + cellx[live].astype(np.int64)
    counts = np.bincount(np.clip(flat, 0, nx * ny - 1), minlength=nx * ny)
    return counts.reshape(ny, nx).astype(np.float64)


# ---------------------------------------------------------------------------
# Checkpoint / resume
# ---------------------------------------------------------------------------

_STATE_FIELDS = ("x", "y", "omega_x", "omega_y", "energy", "weight",
                 "dt_to_census", "mfp_to_collision", "deposit",
                 "cellx", "celly", "dead", "pid", "counter")


def save_checkpoint(path: str, state: ParticleState, tally: np.ndarray,
                    step: int, elapsed_sim_time: float,
                    coords: str = "global") -> None:
    """Write the full simulation state as one compressed npz.

    `coords` records the x/y convention ("global" or "cell-local", the f32
    fast-path representation) so a restore into a differently-configured
    simulation fails loudly instead of silently misplacing particles.

    Paths without a .npz suffix select the Orbax directory backend.
    """
    if _is_orbax_path(path):
        return save_checkpoint_orbax(path, state, tally, step,
                                     elapsed_sim_time, coords=coords)
    payload = {f: np.asarray(getattr(state, f)) for f in _STATE_FIELDS}
    payload["tally"] = np.asarray(tally)
    payload["step"] = np.int64(step)
    payload["elapsed_sim_time"] = np.float64(elapsed_sim_time)
    payload["coords"] = np.bytes_(coords)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **payload)
    os.replace(tmp, path)      # atomic publish: no torn checkpoints


def load_checkpoint(path: str, expect_coords: str = "global"):
    """Returns (state, tally, step, elapsed_sim_time) as host arrays."""
    if os.path.isdir(path):
        return load_checkpoint_orbax(path, expect_coords=expect_coords)
    with np.load(path) as z:
        coords = (z["coords"].item().decode()
                  if "coords" in z.files else "global")
        if coords != expect_coords:
            raise ValueError(
                f"checkpoint stores {coords!r} coordinates but this "
                f"simulation uses {expect_coords!r} (dtype/fast_math "
                "mismatch between save and restore configs)")
        state = ParticleState(**{f: z[f] for f in _STATE_FIELDS})
        return (state, z["tally"], int(z["step"]),
                float(z["elapsed_sim_time"]))


# ---------------------------------------------------------------------------
# Orbax backend (directory checkpoints)
#
# The npz backend is a single host-side file — simple and exact, but it
# funnels every shard through one process.  The Orbax backend writes a
# standard orbax.checkpoint directory instead: on multi-host pods each
# process writes its own shards in parallel (orbax handles the cross-host
# commit protocol), which is the TPU-native answer for large sharded
# particle states.  Selected whenever the checkpoint path has no .npz
# suffix (directory checkpoints); both backends carry the same payload.
# ---------------------------------------------------------------------------

def _is_orbax_path(path: str) -> bool:
    return not path.endswith(".npz")


def save_checkpoint_orbax(path: str, state: ParticleState,
                          tally: np.ndarray, step: int,
                          elapsed_sim_time: float,
                          coords: str = "global") -> None:
    import orbax.checkpoint as ocp

    payload = {f: np.asarray(getattr(state, f)) for f in _STATE_FIELDS}
    payload["tally"] = np.asarray(tally)
    payload["step"] = np.int64(step)
    payload["elapsed_sim_time"] = np.float64(elapsed_sim_time)
    # Orbax stores arrays; encode the convention as a tiny metadata array.
    payload["coords_is_local"] = np.int8(coords == "cell-local")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, expect_coords: str = "global"):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    z = ckptr.restore(os.path.abspath(path))
    coords = "cell-local" if int(z.get("coords_is_local", 0)) else "global"
    if coords != expect_coords:
        raise ValueError(
            f"checkpoint stores {coords!r} coordinates but this "
            f"simulation uses {expect_coords!r} (dtype/fast_math "
            "mismatch between save and restore configs)")
    state = ParticleState(**{f: np.asarray(z[f]) for f in _STATE_FIELDS})
    return (state, np.asarray(z["tally"]), int(z["step"]),
            float(z["elapsed_sim_time"]))
