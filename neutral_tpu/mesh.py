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


def _load_edges(path: str, n_edges: int, extent: float) -> np.ndarray:
    """Read an edge-coordinate file (.npy or whitespace text), validated."""
    if path.endswith(".npy"):
        e = np.load(path)
    else:
        e = np.loadtxt(path, dtype=np.float64)
    e = np.asarray(e, np.float64).reshape(-1)
    if e.shape[0] != n_edges:
        raise ValueError(f"{path}: expected {n_edges} edge coordinates, "
                         f"got {e.shape[0]}")
    if not np.all(np.diff(e) > 0):
        raise ValueError(f"{path}: edge coordinates must be strictly "
                         "ascending")
    if abs(e[0]) > 1e-12 * extent or abs(e[-1] - extent) > 1e-9 * extent:
        raise ValueError(
            f"{path}: edges must span [0, {extent}] (the deck's domain "
            f"extent); got [{e[0]}, {e[-1]}]")
    e[0], e[-1] = 0.0, extent  # snap away file-format rounding
    return e


def _stretch_edges(n: int, extent: float, ratio: float) -> np.ndarray:
    """Geometric-progression edges: cell i+1 is `ratio` x cell i."""
    w = ratio ** np.arange(n, dtype=np.float64)
    e = np.concatenate([[0.0], np.cumsum(w)])
    return e * (extent / e[-1])


def build_edges(cfg: SimConfig) -> tuple[np.ndarray, np.ndarray]:
    """(edgex, edgey) float64 host arrays per the deck's mesh grammar.

    Uniform by default; `edgex_file`/`edgey_file` load explicit edge
    coordinates and `mesh_stretch_x`/`mesh_stretch_y` build geometric
    progressions.  The reference's mesh carries per-cell edge arrays
    through every backend (neutral_interface.h:14-16) — this is the deck
    grammar the arch harness never had for populating them non-uniformly.
    """
    if cfg.edgex_file:
        edgex = _load_edges(cfg.edgex_file, cfg.nx + 1, cfg.width)
    elif cfg.mesh_stretch_x != 1.0:
        edgex = _stretch_edges(cfg.nx, cfg.width, cfg.mesh_stretch_x)
    else:
        edgex = (np.arange(cfg.nx + 1, dtype=np.float64)
                 * (cfg.width / cfg.nx))
    if cfg.edgey_file:
        edgey = _load_edges(cfg.edgey_file, cfg.ny + 1, cfg.height)
    elif cfg.mesh_stretch_y != 1.0:
        edgey = _stretch_edges(cfg.ny, cfg.height, cfg.mesh_stretch_y)
    else:
        edgey = (np.arange(cfg.ny + 1, dtype=np.float64)
                 * (cfg.height / cfg.ny))
    return edgex, edgey


def _cell_centers(cfg: SimConfig) -> tuple[np.ndarray, np.ndarray]:
    """(cx, cy) float64 cell centers from the deck's (possibly
    non-uniform) edges; uniform decks keep the historical closed form
    (bitwise-identical centers, so existing goldens are untouched)."""
    if cfg.uniform_mesh:
        cx = (np.arange(cfg.nx) + 0.5) * (cfg.width / cfg.nx)
        cy = (np.arange(cfg.ny) + 0.5) * (cfg.height / cfg.ny)
        return cx, cy
    edgex, edgey = build_edges(cfg)
    return 0.5 * (edgex[:-1] + edgex[1:]), 0.5 * (edgey[:-1] + edgey[1:])


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
    # Cell centers in physical coordinates (edge midpoints on
    # non-uniform meshes).
    cx, cy = _cell_centers(cfg)
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
    cx, cy = _cell_centers(cfg)
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
    # Non-uniform decks (edge files / geometric stretch) populate the
    # same arrays; consumers see uniform=False and take the gather paths.
    edgex, edgey = build_edges(cfg)
    if with_density:
        density = jnp.asarray(build_density(cfg, dtype=np.dtype(dtype)))
    else:
        density = jnp.zeros((1, 1), dtype)
    return Mesh2D(
        nx=cfg.nx, ny=cfg.ny, width=cfg.width, height=cfg.height,
        edgex=jnp.asarray(edgex.astype(np.dtype(dtype))),
        edgey=jnp.asarray(edgey.astype(np.dtype(dtype))),
        density=density,
        uniform=cfg.uniform_mesh,
    )
