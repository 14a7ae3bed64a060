"""2D structured mesh: edge coordinate arrays and the material density field.

TPU-native replacement for the arch harness's mesh + shared-data modules
(reference call sites: main.c:62-71, the inferred `initialise_mesh_2d` and
`initialise_shared_data_2d`).  The mesh is a pytree of device arrays:

  * edgex (nx+1,), edgey (ny+1,) — cell edge coordinates (supports
    non-uniform meshes; the builders below produce uniform ones),
  * density (ny, nx) — built from the deck's `problem_N` rectangles, later
    entries overwriting earlier ones (membership test: cell center inside
    the half-open box [lo, hi)).

Everything is stored in the simulation compute dtype.  For the sharded mode
the same global arrays are constructed and then sharded by the caller
(parallel/sharding.py) — mesh construction itself is cheap and happens once.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .config import SimConfig


@jax.tree_util.register_pytree_node_class
@dataclass
class Mesh2D:
    nx: int
    ny: int
    width: float
    height: float
    edgex: jnp.ndarray   # (nx+1,)
    edgey: jnp.ndarray   # (ny+1,)
    density: jnp.ndarray  # (ny, nx)
    # Static flag: edges are uniformly spaced (edge[i] = i * pitch).  Lets
    # consumers replace O(log n) gather-based edge searches with a floor
    # division + one exact gather fixup (particles.inject_particles).
    uniform: bool = True

    def tree_flatten(self):
        return ((self.edgex, self.edgey, self.density),
                (self.nx, self.ny, self.width, self.height, self.uniform))

    @classmethod
    def tree_unflatten(cls, aux, children):
        nx, ny, width, height, uniform = aux
        edgex, edgey, density = children
        return cls(nx, ny, width, height, edgex, edgey, density, uniform)


def build_density(cfg: SimConfig, dtype=np.float64) -> np.ndarray:
    """Density field from problem regions (host-side numpy).

    Grid decks (cfg.density_file — a capability beyond the reference,
    whose arch harness can only build density from problem_N rectangles)
    load the (ny, nx) field verbatim instead.
    """
    if cfg.density_file:
        if cfg.density_file.endswith(".npy"):
            density = np.load(cfg.density_file)
        else:
            density = np.loadtxt(cfg.density_file, dtype=np.float64)
        density = np.asarray(density, np.float64)
        if density.shape != (cfg.ny, cfg.nx):
            raise ValueError(
                f"{cfg.density_file}: density grid shape {density.shape} "
                f"!= mesh (ny, nx) = ({cfg.ny}, {cfg.nx})")
        if np.any(density < 0) or not np.all(np.isfinite(density)):
            raise ValueError(f"{cfg.density_file}: densities must be "
                             "finite and non-negative")
        return density.astype(dtype)
    density = np.zeros((cfg.ny, cfg.nx), dtype=np.float64)
    # Cell centers in physical coordinates.
    cx = (np.arange(cfg.nx) + 0.5) * (cfg.width / cfg.nx)
    cy = (np.arange(cfg.ny) + 0.5) * (cfg.height / cfg.ny)
    for region in cfg.problems:
        x0 = region.xpos * cfg.width
        y0 = region.ypos * cfg.height
        x1 = x0 + region.width * cfg.width
        y1 = y0 + region.height * cfg.height
        mx = (cx >= x0) & (cx < x1)
        my = (cy >= y0) & (cy < y1)
        density[np.ix_(my, mx)] = region.density
    return density.astype(dtype)


def region_cell_bounds(cfg: SimConfig) -> tuple:
    """Problem regions as global cell-index rectangles.

    Uses the exact same float64 cell-center membership math as
    build_density, so the analytic density path (transport._density_of)
    selects precisely the same cells as the gathered grid would.
    Returns ((ix0, ix1, iy0, iy1, density), ...) — hashable, for the
    static Geometry.regions field.
    """
    cx = (np.arange(cfg.nx) + 0.5) * (cfg.width / cfg.nx)
    cy = (np.arange(cfg.ny) + 0.5) * (cfg.height / cfg.ny)
    out = []
    for region in cfg.problems:
        x0 = region.xpos * cfg.width
        y0 = region.ypos * cfg.height
        x1 = x0 + region.width * cfg.width
        y1 = y0 + region.height * cfg.height
        mx = (cx >= x0) & (cx < x1)
        my = (cy >= y0) & (cy < y1)
        ix = np.flatnonzero(mx)
        iy = np.flatnonzero(my)
        if ix.size == 0 or iy.size == 0:
            continue
        out.append((int(ix[0]), int(ix[-1]) + 1, int(iy[0]),
                    int(iy[-1]) + 1, float(region.density)))
    return tuple(out)


def build_mesh(cfg: SimConfig, dtype=None, with_density: bool = True
               ) -> Mesh2D:
    """Uniform mesh + density field as device arrays.

    `with_density=False` skips materializing the (ny, nx) density grid
    (64MB at 4000^2) — the fast-math transport evaluates density
    analytically from the problem regions and never reads it, and the
    upload alone costs seconds over a remote-TPU link.
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    # Edges computed in f64 on host then cast: matches the reference's
    # uniform spacing (edge[i] = i * width / nx) to the target precision.
    edgex = (np.arange(cfg.nx + 1, dtype=np.float64) * (cfg.width / cfg.nx))
    edgey = (np.arange(cfg.ny + 1, dtype=np.float64) * (cfg.height / cfg.ny))
    if with_density:
        density = jnp.asarray(build_density(cfg, dtype=np.dtype(dtype)))
    else:
        density = jnp.zeros((1, 1), dtype)
    return Mesh2D(
        nx=cfg.nx, ny=cfg.ny, width=cfg.width, height=cfg.height,
        edgex=jnp.asarray(edgex.astype(np.dtype(dtype))),
        edgey=jnp.asarray(edgey.astype(np.dtype(dtype))),
        density=density,
    )
