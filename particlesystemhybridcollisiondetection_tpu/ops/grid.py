"""Static uniform triangle grid: the TPU-native broad phase.

The reference builds a sphere-BVH on the CPU (Morton-code top levels + SAH
leaf splitting, ParticleSys.cs:1103-1305) and traverses it per-particle on
the GPU with an explicit 128-deep stack
(SpatialStructureCollisionDetection.compute:235-356).  Divergent stack
traversal is hostile to a dense SIMD machine, so the TPU design replaces it
with a uniform grid over the static scene:

  * Build (host, once per scene): every triangle's AABB is expanded by a
    conservative radius ``expand`` and binned into all grid cells it
    overlaps, producing a CSR table (cell -> triangle ids).
  * Query (device, per step): each particle reads the candidate list of
    *its own cell only* -- one gather, no traversal, no stack.

Correctness argument for the single-cell lookup: during one step the
particle sweeps the segment [p, p + v*dt]; any triangle it contacts is
within ``r`` of some segment point, hence within ``r + |v|*dt/2`` of the
segment MIDPOINT m = p + v*dt/2.  The query paths therefore look up the
cell of ``lookup_pos(p, v, dt) = m`` (not of p), and the binning radius
only needs ``expand >= r + max_travel/2``.  ``max_travel`` is a
scene-config bound: particles spawn at rest and restitution < 1 only
slows them, so within a T-second episode speed <= g*T regardless of drop
height (benchmark scenes: 9.81 * 20.01 s = 196.3 u/s * dt 0.01 = 1.963
units of travel; r = 2 -> expand >= 2.982; presets use 3.1).  Round 3
used a p-anchored lookup, which needs the full ``r + max_travel`` and
whose dragon preset (expand 3.2) silently under-covered fast top-layer
particles at k >= 4; the midpoint lookup both restores soundness and
shrinks every cell's candidate list (bunny: -28% narrow-phase volume).

Particles outside the grid clamp to a border cell; since the grid covers
the scene AABB + expand, such particles are provably out of reach of every
triangle and the narrow phase rejects whatever candidates the border cell
offers (wasted lanes, never wrong results).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from particlesystemhybridcollisiondetection_tpu.config import GridConfig


@dataclasses.dataclass(frozen=True)
class GridMeta:
    """Static (trace-time) grid geometry."""

    origin: tuple  # (3,) world position of cell (0,0,0) corner
    cell_size: float
    dims: tuple  # (3,) cells per axis
    max_tris_per_cell: int  # K of the dense candidate gather
    num_pairs: int
    num_triangles: int

    @property
    def num_cells(self) -> int:
        return int(np.prod(self.dims))


class TriangleGrid(NamedTuple):
    """Device-side CSR grid + planar triangle soup."""

    offsets: jnp.ndarray  # i32[C + 1]
    tri_ids: jnp.ndarray  # i32[P] triangle index per (cell, tri) pair
    v0: jnp.ndarray  # f32[3, T]
    v1: jnp.ndarray  # f32[3, T]
    v2: jnp.ndarray  # f32[3, T]


def build_triangle_grid(
    triangles: np.ndarray,
    cfg: GridConfig,
    *,
    margin: float = 1e-3,
    use_native: bool = True,
) -> tuple[TriangleGrid, GridMeta]:
    """Host-side one-time build.  triangles: f32[T, 3, 3] world soup.

    Fully vectorized NumPy (no Python loop over triangles): per-triangle
    cell ranges -> pair expansion via repeat + offset decode -> bincount
    CSR.  This is the analog of BuildAndSetupBvh (ParticleSys.cs:383-442)
    and is orders of magnitude faster than the reference's per-node SAH
    rescans.  With ``use_native`` (default) the multithreaded C++ binner
    (native/psys_native.cpp) is used when available; both paths produce
    identical CSR tables.
    """
    if use_native:
        built = _build_native(triangles, cfg, margin)
        if built is not None:
            return built
    tris = np.asarray(triangles, dtype=np.float64)
    t_count = len(tris)
    h = float(cfg.cell_size)
    r = float(cfg.expand)

    lo_w = tris.min(axis=1) - r - margin  # [T, 3]
    hi_w = tris.max(axis=1) + r + margin

    origin = tris.reshape(-1, 3).min(axis=0) - r - h  # pad one cell
    top = tris.reshape(-1, 3).max(axis=0) + r + h
    dims = np.maximum(np.ceil((top - origin) / h).astype(np.int64), 1)

    lo = np.clip(np.floor((lo_w - origin) / h).astype(np.int64), 0, dims - 1)
    hi = np.clip(np.floor((hi_w - origin) / h).astype(np.int64), 0, dims - 1)
    span = hi - lo + 1  # [T, 3]
    counts = span.prod(axis=1)  # cells per triangle
    p_total = int(counts.sum())

    # Expand (tri, cell) pairs: for pair k of triangle t, decode its local
    # (dx, dy, dz) from the pair's rank within the triangle.
    pair_tri = np.repeat(np.arange(t_count, dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(p_total, dtype=np.int64) - starts[pair_tri]
    sz = span[pair_tri]  # [P, 3]
    dz = local % sz[:, 2]
    dy = (local // sz[:, 2]) % sz[:, 1]
    dx = local // (sz[:, 2] * sz[:, 1])
    cx = lo[pair_tri, 0] + dx
    cy = lo[pair_tri, 1] + dy
    cz = lo[pair_tri, 2] + dz

    # L2 prefilter: keep a (tri, cell) pair only when the EUCLIDEAN
    # distance between the triangle's AABB and the cell box is <= expand
    # (+ margin).  The axis-range enumeration above implicitly tests the
    # L-infinity distance, which keeps every cell in the CUBE of radius
    # ``expand`` around the triangle; the correctness invariant (a
    # particle in cell c must see every triangle within ``expand`` of any
    # point of c, see the module docstring) only requires the BALL.  For
    # the small triangles of dense scanned meshes this cuts ~45% of pairs
    # (dragon scene: mean cell occupancy 33 -> ~18).  dist(AABB(tri),
    # box) <= dist(tri, box), so the filter is conservative.  The native
    # binner implements the identical double-precision expression
    # (bit-identical CSR tables, asserted by tests/test_native.py).
    tlo = tris.min(axis=1)  # [T, 3] raw (uninflated) AABB
    thi = tris.max(axis=1)
    ee = r + margin
    d2 = np.zeros(p_total, dtype=np.float64)
    for a, ca in ((0, cx), (1, cy), (2, cz)):
        box_lo = origin[a] + ca * h
        box_hi = origin[a] + (ca + 1) * h
        g = np.maximum(
            np.maximum(tlo[pair_tri, a] - box_hi, box_lo - thi[pair_tri, a]),
            0.0,
        )
        d2 = d2 + g * g
    keep = d2 <= ee * ee
    pair_tri = pair_tri[keep]
    cell = (cx[keep] * dims[1] + cy[keep]) * dims[2] + cz[keep]
    p_total = int(keep.sum())

    order = np.argsort(cell, kind="stable")
    cell_sorted = cell[order]
    tri_sorted = pair_tri[order].astype(np.int32)

    num_cells = int(dims.prod())
    cell_counts = np.bincount(cell_sorted, minlength=num_cells)
    offsets = np.zeros(num_cells + 1, dtype=np.int64)
    np.cumsum(cell_counts, out=offsets[1:])
    k_max = int(cell_counts.max()) if num_cells else 0

    meta = GridMeta(
        origin=tuple(float(x) for x in origin),
        cell_size=h,
        dims=tuple(int(d) for d in dims),
        max_tris_per_cell=max(k_max, 1),
        num_pairs=p_total,
        num_triangles=t_count,
    )
    tris32 = tris.astype(np.float32)
    grid = TriangleGrid(
        offsets=jnp.asarray(offsets.astype(np.int32)),
        tri_ids=jnp.asarray(tri_sorted),
        v0=jnp.asarray(tris32[:, 0, :].T),
        v1=jnp.asarray(tris32[:, 1, :].T),
        v2=jnp.asarray(tris32[:, 2, :].T),
    )
    return grid, meta


def _build_native(triangles, cfg: GridConfig, margin: float):
    """C++ binning path; returns None when the native tier is missing."""
    from particlesystemhybridcollisiondetection_tpu import native

    lib = native.load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(triangles, dtype=np.float32)
    t_count = len(tris)
    if t_count == 0:
        return None
    handle = lib.psys_grid_build(
        tris.reshape(-1), t_count, float(cfg.cell_size), float(cfg.expand),
        float(margin), 8,
    )
    dims = np.empty(3, dtype=np.int64)
    origin = np.empty(3, dtype=np.float64)
    n_pairs = np.empty(1, dtype=np.int64)
    lib.psys_grid_info(handle, dims, origin, n_pairs)
    num_cells = int(dims.prod())
    offsets = np.empty(num_cells + 1, dtype=np.int64)
    tri_ids = np.empty(int(n_pairs[0]), dtype=np.int32)
    lib.psys_grid_export(handle, offsets, tri_ids)
    lib.psys_grid_free(handle)

    counts = np.diff(offsets)
    meta = GridMeta(
        origin=tuple(float(x) for x in origin),
        cell_size=float(cfg.cell_size),
        dims=tuple(int(d) for d in dims),
        max_tris_per_cell=max(int(counts.max()) if num_cells else 0, 1),
        num_pairs=int(n_pairs[0]),
        num_triangles=t_count,
    )
    grid = TriangleGrid(
        offsets=jnp.asarray(offsets.astype(np.int32)),
        tri_ids=jnp.asarray(tri_ids),
        v0=jnp.asarray(tris[:, 0, :].T),
        v1=jnp.asarray(tris[:, 1, :].T),
        v2=jnp.asarray(tris[:, 2, :].T),
    )
    return grid, meta


class PackedGrid(NamedTuple):
    """Gather-optimized PLANAR layout of the CSR grid.

    Layouts are load-bearing on TPU: XLA lowers a multi-row axis-1 gather
    (``tab[:, idx]`` with ``tab`` a jit argument) to a fast vectorized
    path (~0.04 ms for 1M indices on v5e), while 1-D gathers and
    trailing-axis row gathers take a ~9.5 ns/index scalar path (9.5-33 ms
    at 1M).  Measured 2026-08; see benchmarks/profile_sorted.py.  So both
    tables here keep the gathered axis LAST:

    rows:  f32[group * 9, Pg]  (v0 v1 v2 xyz per candidate slot;
           sentinel 1e38 columns beyond each cell's count)
    cells: i32[2, C] = (first packed row, pair count) per cell
    """

    rows: jnp.ndarray
    cells: jnp.ndarray


def pack_grid(grid: TriangleGrid, meta: GridMeta, group: int = 8):
    """Build the packed layout (host side, once per scene).

    Returns (PackedGrid, num_groups_max) where num_groups_max =
    ceil(max_tris_per_cell / group) bounds the per-step gather loop.
    """
    offsets = np.asarray(grid.offsets).astype(np.int64)
    tri_ids = np.asarray(grid.tri_ids)
    counts = np.diff(offsets)
    groups = (counts + group - 1) // group  # packed rows per cell
    row_start = np.concatenate([[0], np.cumsum(groups)])
    pg_rows = int(row_start[-1])

    verts = np.concatenate(
        [np.asarray(grid.v0).T, np.asarray(grid.v1).T, np.asarray(grid.v2).T],
        axis=1,
    ).astype(np.float32)  # [T, 9]

    rows = np.full((max(pg_rows, 1), group, 9), 1.0e38, dtype=np.float32)
    # scatter each pair into its packed slot
    cell_of_pair = np.repeat(np.arange(len(counts)), counts)
    rank = np.arange(len(tri_ids)) - np.repeat(offsets[:-1], counts)
    dst_row = row_start[cell_of_pair] + rank // group
    dst_slot = rank % group
    rows[dst_row, dst_slot] = verts[tri_ids]

    cells = np.stack([row_start[:-1], counts], axis=0).astype(np.int32)  # [2, C]
    packed = PackedGrid(
        rows=jnp.asarray(
            np.ascontiguousarray(
                rows.reshape(max(pg_rows, 1), group * 9).T
            )
        ),  # [group*9, Pg] planar
        cells=jnp.asarray(cells),
    )
    num_groups_max = int(groups.max()) if len(groups) else 1
    return packed, max(num_groups_max, 1)


def lookup_pos(pos: jnp.ndarray, vel: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Swept-lookup anchor: the midpoint of this step's travel segment.

    Every grid query (cell_index / morton_key / gather_candidates) must
    key on this, not on ``pos``: the binning radius ``expand`` only
    covers ``r + travel/2`` around the MIDPOINT of [p, p + v*dt] (module
    docstring).  Settled particles (v ~ 0) are unaffected.  Sentinel
    particles still clamp to the border cell by MAGNITUDE, not by
    velocity: padding lanes are integrated every step (core/state.py),
    so their speed accumulates g*t (~196 u/s by episode end), but in
    float32 ``1e38 + v*dt/2 == 1e38`` -- the midpoint equals the
    sentinel position exactly and lands in the clamped border cell.
    """
    return pos + vel * (dt * 0.5)


def cell_coords(pos: jnp.ndarray, meta: GridMeta):
    """(cx, cy, cz) i32[N] clamped cell coordinates for positions [3, N]."""
    origin = jnp.asarray(meta.origin, dtype=pos.dtype)
    inv_h = 1.0 / meta.cell_size
    dims = meta.dims
    # floor + clip per axis; sentinel positions (1e38) clamp to the border.
    c = jnp.floor((pos - origin[:, None]) * inv_h)
    cx = jnp.clip(c[0], 0, dims[0] - 1).astype(jnp.int32)
    cy = jnp.clip(c[1], 0, dims[1] - 1).astype(jnp.int32)
    cz = jnp.clip(c[2], 0, dims[2] - 1).astype(jnp.int32)
    return cx, cy, cz


def cell_index(pos: jnp.ndarray, meta: GridMeta) -> jnp.ndarray:
    """i32[N] linear cell id for particle positions [3, N] (clamped)."""
    cx, cy, cz = cell_coords(pos, meta)
    dims = meta.dims
    return (cx * dims[1] + cy) * dims[2] + cz


def _morton_spread(x):
    """Spread the low 10 bits of x to every 3rd bit (works on jnp and np
    int32 arrays)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_key(pos: jnp.ndarray, meta: GridMeta) -> jnp.ndarray:
    """i32[N] Morton (z-order) code of each particle's cell.

    Used as the SORT key of the sorted block-window pipeline: under the
    linear id, cells adjacent in x/y sit a whole grid row apart in the
    CSR table, so particles settled across a 2D surface produce window
    spans of 10^4-10^5 rows (measured on the dragon scene: p90 span 71k
    rows per 128 particles, 36% window overflow).  The z-order key keeps
    3D-adjacent cells id-adjacent, so a sublane of 128 sorted particles
    maps to a compact CSR range of the Morton-ordered pair table (see
    window_kernel.build_window_tables).
    """
    cx, cy, cz = cell_coords(pos, meta)
    return (
        _morton_spread(cx)
        | (_morton_spread(cy) << 1)
        | (_morton_spread(cz) << 2)
    )


def morton_cell_codes(meta: GridMeta) -> np.ndarray:
    """Host-side i64[C] Morton code of every linear cell id."""
    dims = meta.dims
    allc = np.arange(meta.num_cells, dtype=np.int64)
    cz = allc % dims[2]
    cy = (allc // dims[2]) % dims[1]
    cx = allc // (dims[2] * dims[1])
    return (
        _morton_spread(cx.astype(np.int32)).astype(np.int64)
        | (_morton_spread(cy.astype(np.int32)).astype(np.int64) << 1)
        | (_morton_spread(cz.astype(np.int32)).astype(np.int64) << 2)
    )


def gather_candidates(
    grid: TriangleGrid, meta: GridMeta, pos: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-particle candidate triangles.

    Returns (v0, v1, v2, mask): verts [3, N, K], validity mask [N, K].
    This is the whole broad phase at query time: three gathers.
    """
    k = meta.max_tris_per_cell
    cid = cell_index(pos, meta)  # [N]
    start = grid.offsets[cid]  # [N]
    count = grid.offsets[cid + 1] - start  # [N]
    j = jnp.arange(k, dtype=jnp.int32)[None, :]  # [1, K]
    mask = j < count[:, None]  # [N, K]
    pair_idx = jnp.clip(start[:, None] + j, 0, grid.tri_ids.shape[0] - 1)
    tid = grid.tri_ids[pair_idx]  # [N, K]
    v0 = grid.v0[:, tid]  # [3, N, K]
    v1 = grid.v1[:, tid]
    v2 = grid.v2[:, tid]
    return v0, v1, v2, mask
