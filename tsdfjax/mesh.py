"""Marching-cubes surface extraction + mesh post-processing + OBJ/PLY/OFF I/O.

TPU-first redesign of the reference meshing stack (SURVEY.md §2.4/§2.6):

  - extractIsoSurfaceKernel (marchingcube.cu:138-153) appends triangles
    through a global atomicAdd counter; here the per-cell triangle counts
    go through an exclusive cumsum and triangles scatter to their
    computed offsets — deterministic, race-free, and jittable. A static
    max-triangle budget (the reference also has one, config.ini:48)
    bounds the output buffer; overflow triangles are dropped and counted.
  - the cell grid is the voxel-center lattice: the reference samples 8
    trilinear corners at cell-center +- half cell (marchingcube.cu:44-75),
    which is exactly the voxel-center values; cells with any unobserved
    (weight==0) corner or any |corner tsdf| > threshold are skipped
    (cu:101-108 — threshold 300*voxel_size via
    MeshGeneratorMarchingcube.cpp:26-27, inert at default configs).
  - vertex positions by linear interpolation to the zero crossing with
    the reference's 1e-5 degenerate guards (vertexInterp, cu:16-41);
    colors interpolated the same way.
  - host-side post: vertex welding on a quantized grid (the reference's
    mergeCloseVertices spatial hash, meshData.cpp:198-260), duplicate
    face removal, area-weighted vertex normals (meshData.h:713-736), and
    OBJ/PLY/OFF writers (MeshIO.cpp dispatch-on-extension semantics).

The extraction is chunked over x-slabs with lax.map so the peak
footprint stays ~slab-sized even at 512^3.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tsdfjax.config import VolumeConfig
from tsdfjax.mc_tables import EDGE_CORNERS, MAX_TRIS_PER_CELL, TRI_COUNT, TRI_TABLE
from tsdfjax.volume import TsdfVolume

Array = jnp.ndarray

# cube corner offsets in (x, y, z), matching mc_tables.CORNER_POS
_CORNER_OFFSETS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    dtype=np.int32,
)


class MeshBuffers(NamedTuple):
    """Raw triangle soup from extraction (device arrays)."""

    vertices: Array  # (max_tris, 3, 3) f32 world coords
    colors: Array  # (max_tris, 3, 3) f32 0..255
    count: Array  # () i32 — triangles actually written
    overflow: Array  # () i32 — triangles dropped at capacity


def _pick_slab(n_cells: int, target: int = 8) -> int:
    """Largest divisor of n_cells that is <= target (res-1 is usually odd)."""
    for s in range(min(target, n_cells), 0, -1):
        if n_cells % s == 0:
            return s
    return 1


def _marching_cubes_impl(
    tsdf: Array,
    weight: Array,
    color: Array,
    vol_cfg: VolumeConfig,
    max_triangles: int,
    iso_threshold: float | None,
    with_color: bool,
    slab: int | None,
    x0: Array | int = 0,
    axis_name: str | None = None,
) -> MeshBuffers:
    """Core extraction over an x-slab of the volume.

    The arrays span voxel x in [x0, x0 + nx) globally (x0 traced); cells
    with base x in [x0, x0 + nx - 1) are extracted. The dense path passes
    the full (R, R, R) arrays with x0 = 0; the sharded path passes each
    shard's slab extended by ONE right-halo voxel slice (corner reads
    cross the face), so every global cell is extracted by exactly one
    shard and the concatenated soups equal the dense soup."""
    res = vol_cfg.resolution
    cell = vol_cfg.voxel_size_m
    n_cells_x = tsdf.shape[0] - 1
    n_cells = res - 1  # y/z cell extent (always the full volume)
    if iso_threshold is None:
        iso_threshold = 300.0 * cell  # MeshGeneratorMarchingcube.cpp:26-27
    if slab is None:
        slab = _pick_slab(n_cells_x)
    assert n_cells_x % slab == 0, "slab must divide the x cell extent"
    n_slabs = n_cells_x // slab

    tri_table = jnp.asarray(TRI_TABLE)
    tri_count = jnp.asarray(TRI_COUNT)
    edge_corners = jnp.asarray(EDGE_CORNERS)
    corner_off = jnp.asarray(_CORNER_OFFSETS)
    x0f = jnp.asarray(x0, jnp.float32)

    def slab_fields(x_start):
        """Per-slab cell fields WITHOUT candidate expansion: case index,
        per-cell triangle counts, and the 12 interpolated edge vertices
        (+ colors) per cell. Triangle rows are only materialized for
        COMPACTED slots in scan_body (the old path expanded all
        cells*MAX_TRIS candidates and was gather/scatter-bound)."""
        xs = x_start
        t_slab = jax.lax.dynamic_slice_in_dim(tsdf, xs, slab + 1, 0)
        w_slab = jax.lax.dynamic_slice_in_dim(weight, xs, slab + 1, 0)
        shape = (slab, n_cells, n_cells)
        ix = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        iz = jax.lax.broadcasted_iota(jnp.int32, shape, 2)

        corner_t = []
        corner_w = []
        for k in range(8):
            dx, dy, dz = _CORNER_OFFSETS[k]
            corner_t.append(t_slab[dx : dx + slab, dy : dy + n_cells, dz : dz + n_cells])
            corner_w.append(w_slab[dx : dx + slab, dy : dy + n_cells, dz : dz + n_cells])
        ct = jnp.stack(corner_t, axis=-1)  # (slab, n, n, 8)
        cw = jnp.stack(corner_w, axis=-1)

        observed = jnp.all(cw > 0, axis=-1)
        in_range = jnp.all(jnp.abs(ct) <= iso_threshold, axis=-1)
        inside = (ct < 0).astype(jnp.int32)
        case = jnp.sum(inside << jnp.arange(8, dtype=jnp.int32), axis=-1)
        case = jnp.where(observed & in_range, case, 0)
        ntri = tri_count[case]  # (slab, n, n)

        # world positions of the 8 corners (voxel centers)
        cx = (ix + xs).astype(jnp.float32) + x0f
        base = jnp.stack([cx, iy.astype(jnp.float32), iz.astype(jnp.float32)], axis=-1)
        cpos = (base[..., None, :] + corner_off.astype(jnp.float32) + 0.5) * cell
        # (slab, n, n, 12, 3) edge vertices. The jnp.take calls index a
        # constant-size-8/12 axis with constant indices -> XLA lowers them
        # to slices, not gathers.
        a_idx = edge_corners[:, 0]
        b_idx = edge_corners[:, 1]
        va = jnp.take(ct, a_idx, axis=-1)
        vb = jnp.take(ct, b_idx, axis=-1)
        pa = jnp.take(cpos, a_idx, axis=-2)
        pb = jnp.take(cpos, b_idx, axis=-2)
        denom = vb - va
        # vertexInterp degenerate guards (marchingcube.cu:16-41)
        mu = jnp.where(jnp.abs(denom) < 1e-30, 0.5, (0.0 - va) / jnp.where(denom == 0, 1.0, denom))
        mu = jnp.where(jnp.abs(va) < 1e-5, 0.0, jnp.where(jnp.abs(vb) < 1e-5, 1.0, mu))
        everts = pa + mu[..., None] * (pb - pa)  # (slab, n, n, 12, 3)

        if with_color:
            c_slab = jax.lax.dynamic_slice_in_dim(color, xs, slab + 1, 0)
            cc = jnp.stack(
                [
                    c_slab[dx : dx + slab, dy : dy + n_cells, dz : dz + n_cells]
                    for (dx, dy, dz) in _CORNER_OFFSETS
                ],
                axis=-2,
            )  # (slab, n, n, 8, 3)
            ca = jnp.take(cc, a_idx, axis=-2)
            cb = jnp.take(cc, b_idx, axis=-2)
            ecolors = ca + mu[..., None] * (cb - ca)
        else:
            ecolors = jnp.zeros((*shape, 12, 3), jnp.float32)

        m = slab * n_cells * n_cells
        return (
            ntri.reshape(m),
            case.reshape(m),
            everts.reshape(m, 12, 3),
            ecolors.reshape(m, 12, 3),
        )

    # Stream compaction instead of full-candidate scatter: a slab has
    # slab*(res-1)^2 cells but only ~surface-area many real triangles,
    # and TPU gather/scatter cost scales with the candidate volume (the
    # old expand-all + `.at[dest].set` path took 21 s at 256^3 on one
    # v5e). Triangle s of a slab lives in the cell found by binary search
    # on the inclusive cumsum of per-cell counts; only the <= tri_cap
    # winners gather their table rows and edge vertices, and the block is
    # written with ONE contiguous dynamic_update_slice at the running
    # total — no scatter anywhere. `tri_cap` bounds triangles per slab
    # step: 2*(res-1)^2 covers a full plane-parallel wall (the worst
    # case); anything beyond is dropped and counted in overflow.
    m_cells = slab * n_cells * n_cells
    tri_cap = min(2 * n_cells * n_cells, m_cells * MAX_TRIS_PER_CELL)
    slots = jnp.arange(tri_cap, dtype=jnp.int32)
    tri_table_flat = tri_table.reshape(256, MAX_TRIS_PER_CELL, 3)

    # output padded by tri_cap: each step writes a full tri_cap block at
    # the running total; rows past the step's real count are zeros that
    # the NEXT step overwrites, and rows past max_triangles land in the
    # pad (the reference's drop-at-capacity, config.ini:48)
    out_v = jnp.zeros((max_triangles + tri_cap, 3, 3), jnp.float32)
    out_c = jnp.zeros((max_triangles + tri_cap, 3, 3), jnp.float32)
    total0 = jnp.array(0, jnp.int32)
    dropped0 = jnp.array(0, jnp.int32)
    if axis_name is not None:
        # under shard_map the carry reads the sharded slab -> varying
        out_v, out_c, total0, dropped0 = jax.lax.pvary(
            (out_v, out_c, total0, dropped0), axis_name
        )

    def scan_body(carry, x_start):
        out_v, out_c, total, dropped = carry
        ntri, case_f, everts, ecolors = slab_fields(x_start)
        ccum = jnp.cumsum(ntri)  # (m_cells,) inclusive
        n_val = ccum[-1]
        # cell of the (s+1)-th triangle; its index within the cell
        cell_idx = jnp.searchsorted(ccum, slots + 1, side="left")
        cell_idx = jnp.minimum(cell_idx, m_cells - 1)
        t_base = ccum[cell_idx] - ntri[cell_idx]
        t_in = jnp.clip(slots - t_base, 0, MAX_TRIS_PER_CELL - 1)
        slot_ok = slots < jnp.minimum(n_val, tri_cap)
        # edge ids of the winning triangles from the case table
        tt = tri_table_flat[case_f[cell_idx]]  # (tri_cap, MAX, 3)
        e3 = jnp.take_along_axis(tt, t_in[:, None, None], axis=1)[:, 0]  # (tri_cap, 3)
        e3 = jnp.maximum(e3, 0).astype(jnp.int32)
        flat_ev = (cell_idx[:, None] * 12 + e3).reshape(-1)  # (tri_cap*3,)
        rows_v = everts.reshape(-1, 3)[flat_ev].reshape(tri_cap, 3, 3)
        rows_c = ecolors.reshape(-1, 3)[flat_ev].reshape(tri_cap, 3, 3)
        rows_v = jnp.where(slot_ok[:, None, None], rows_v, 0.0)
        rows_c = jnp.where(slot_ok[:, None, None], rows_c, 0.0)
        offset = jnp.minimum(total, max_triangles)
        out_v = jax.lax.dynamic_update_slice(out_v, rows_v, (offset, 0, 0))
        out_c = jax.lax.dynamic_update_slice(out_c, rows_c, (offset, 0, 0))
        written = jnp.minimum(n_val, tri_cap)
        return (out_v, out_c, total + written, dropped + n_val - written), None

    x_starts = jnp.arange(n_slabs, dtype=jnp.int32) * slab
    (out_v, out_c, total, dropped), _ = jax.lax.scan(
        scan_body, (out_v, out_c, total0, dropped0), x_starts
    )

    count = jnp.minimum(total, max_triangles)
    return MeshBuffers(
        vertices=out_v[:max_triangles], colors=out_c[:max_triangles], count=count,
        overflow=dropped + jnp.maximum(total - max_triangles, 0),
    )


@partial(jax.jit, static_argnames=("vol_cfg", "max_triangles", "with_color", "slab"))
def marching_cubes(
    volume: TsdfVolume,
    vol_cfg: VolumeConfig,
    max_triangles: int = 1_500_000,
    iso_threshold: float | None = None,
    with_color: bool = False,
    slab: int | None = None,
) -> MeshBuffers:
    """Extract the zero isosurface as a triangle soup (dense volume)."""
    return _marching_cubes_impl(
        volume.tsdf, volume.weight, volume.color, vol_cfg, max_triangles,
        iso_threshold, with_color, slab,
    )


# ---------------------------------------------------------------------------
# Host-side mesh container + post-processing (the ml::MeshData equivalents)
# ---------------------------------------------------------------------------


class Mesh:
    """Indexed triangle mesh on host (numpy)."""

    def __init__(self, vertices, faces, colors=None, normals=None):
        self.vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
        self.faces = np.asarray(faces, np.int64).reshape(-1, 3)
        self.colors = None if colors is None else np.asarray(colors, np.float32).reshape(-1, 3)
        self.normals = None if normals is None else np.asarray(normals, np.float32).reshape(-1, 3)

    @property
    def num_vertices(self):
        return len(self.vertices)

    @property
    def num_faces(self):
        return len(self.faces)

    def apply_transform(self, t: np.ndarray) -> "Mesh":
        """meshData.h:484 applyTransform equivalent."""
        v = self.vertices @ t[:3, :3].T + t[:3, 3]
        n = None
        if self.normals is not None:
            n = self.normals @ t[:3, :3].T
        return Mesh(v, self.faces, self.colors, n)


def mesh_from_buffers(buffers: MeshBuffers, merge_eps: float = 1e-4) -> Mesh:
    """Triangle soup -> welded indexed mesh. Mirrors the reference's
    saveMesh pipeline: index buffer + mergeCloseVertices(1e-4, approx) +
    removeDuplicateFaces (MeshGeneratorMarchingcube.cpp:61-97)."""
    n = int(buffers.count)
    tv = np.asarray(buffers.vertices[:n]).reshape(-1, 3)
    tc = np.asarray(buffers.colors[:n]).reshape(-1, 3)
    return weld_mesh(tv, tc, merge_eps)


def weld_mesh(tri_vertices: np.ndarray, tri_colors: np.ndarray | None, merge_eps: float) -> Mesh:
    """Quantized-grid vertex weld (the spatial-hash 'approx' mode of
    meshData.cpp:198-260) + duplicate-face removal.

    Uses the native C++ path (tsdfjax.native / native/meshops.cpp) when
    available — ~10x faster than the NumPy fallback at reference mesh
    sizes (1.5M triangles)."""
    tri_vertices = np.asarray(tri_vertices).reshape(-1, 3)
    if tri_colors is not None:
        tri_colors = np.asarray(tri_colors).reshape(-1, 3)
    if len(tri_vertices) == 0:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    from tsdfjax import native

    nat = native.weld(tri_vertices, tri_colors, merge_eps)
    if nat is not None:
        verts, colors, faces = nat
        return Mesh(verts, faces, colors)
    keys = np.round(tri_vertices / merge_eps).astype(np.int64)
    uniq, first_idx, inverse = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    vertices = tri_vertices[first_idx]
    colors = None if tri_colors is None else tri_colors[first_idx]
    faces = inverse.reshape(-1, 3)
    # drop degenerate faces (meshData removeDegeneratedFaces)
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]
    # duplicate-face removal (meshData.cpp:42): same vertex set
    if len(faces):
        sorted_f = np.sort(faces, axis=1)
        _, keep = np.unique(sorted_f, axis=0, return_index=True)
        faces = faces[np.sort(keep)]
    return Mesh(vertices, faces, colors)


def merge_meshes(a: Mesh, b: Mesh) -> Mesh:
    """Concatenate two meshes (ml::MeshData::merge, meshData.h). Optional
    attributes are kept only when both inputs carry them."""
    v = np.concatenate([a.vertices, b.vertices], axis=0)
    f = np.concatenate([a.faces, b.faces + len(a.vertices)], axis=0)
    c = (
        np.concatenate([a.colors, b.colors], axis=0)
        if a.colors is not None and b.colors is not None
        else None
    )
    n = (
        np.concatenate([a.normals, b.normals], axis=0)
        if a.normals is not None and b.normals is not None
        else None
    )
    return Mesh(v, f, c, n)


def remove_degenerate_faces(mesh: Mesh) -> Mesh:
    """Drop faces with a repeated vertex index
    (ml::MeshData::removeDegeneratedFaces)."""
    f = mesh.faces
    good = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    return Mesh(mesh.vertices, f[good], mesh.colors, mesh.normals)


def remove_isolated_vertices(mesh: Mesh) -> Mesh:
    """Drop vertices referenced by no face and reindex
    (ml::MeshData::removeIsolatedVertices)."""
    used = np.zeros(len(mesh.vertices), bool)
    used[mesh.faces.reshape(-1)] = True
    remap = np.cumsum(used) - 1
    v = mesh.vertices[used]
    f = remap[mesh.faces]
    c = None if mesh.colors is None else mesh.colors[used]
    n = None if mesh.normals is None else mesh.normals[used]
    return Mesh(v, f, c, n)


class Plane:
    """Oriented plane n.x = d (ml::Plane, utils/mesh/plane.h): from a
    normal + distance or from three points."""

    def __init__(self, normal, dist: float):
        n = np.asarray(normal, np.float64)
        self.normal = (n / np.linalg.norm(n)).astype(np.float32)
        self.dist = float(dist)

    @classmethod
    def from_points(cls, p0, p1, p2) -> "Plane":
        p0, p1, p2 = (np.asarray(p, np.float64) for p in (p0, p1, p2))
        n = np.cross(p1 - p0, p2 - p0)
        n = n / np.linalg.norm(n)
        return cls(n, float(n @ p0))

    def signed_distance(self, points: np.ndarray) -> np.ndarray:
        return np.asarray(points, np.float32) @ self.normal - self.dist


def clip_mesh(mesh: Mesh, plane: Plane, keep_positive: bool = True) -> Mesh:
    """Clip against a plane, splitting crossing triangles along the
    intersection (the ml::MeshData plane-clipping op, meshData.h:544-559).
    Keeps the side where signed_distance >= 0 (or <= 0)."""
    sd = plane.signed_distance(mesh.vertices)
    if not keep_positive:
        sd = -sd
    inside = sd >= 0.0

    tri_in = inside[mesh.faces]  # (F, 3)
    n_in = tri_in.sum(axis=1)
    keep_whole = mesh.faces[n_in == 3]

    new_tris: list[np.ndarray] = []  # (3,3) vertex coords
    new_cols: list[np.ndarray] = []
    has_c = mesh.colors is not None

    def lerp_attr(arr, i, j, t):
        return arr[i] + t * (arr[j] - arr[i])

    for face, tin in zip(mesh.faces[(n_in == 1) | (n_in == 2)],
                         tri_in[(n_in == 1) | (n_in == 2)]):
        # Sutherland-Hodgman on one triangle -> convex polygon -> fan
        poly_v, poly_c = [], []
        for k in range(3):
            i, j = face[k], face[(k + 1) % 3]
            if tin[k]:
                poly_v.append(mesh.vertices[i])
                if has_c:
                    poly_c.append(mesh.colors[i])
            if tin[k] != tin[(k + 1) % 3]:
                t = sd[i] / (sd[i] - sd[j])
                poly_v.append(lerp_attr(mesh.vertices, i, j, t))
                if has_c:
                    poly_c.append(lerp_attr(mesh.colors, i, j, t))
        for k in range(1, len(poly_v) - 1):
            new_tris.append(np.stack([poly_v[0], poly_v[k], poly_v[k + 1]]))
            if has_c:
                new_cols.append(np.stack([poly_c[0], poly_c[k], poly_c[k + 1]]))

    base_v = mesh.vertices
    out_v = [base_v]
    out_f = [keep_whole]
    out_c = [mesh.colors] if has_c else None
    nv = len(base_v)
    if new_tris:
        tv = np.concatenate(new_tris, axis=0).astype(np.float32)
        out_v.append(tv)
        out_f.append(np.arange(len(tv), dtype=np.int64).reshape(-1, 3) + nv)
        if has_c:
            out_c.append(np.concatenate(new_cols, axis=0).astype(np.float32))
    clipped = Mesh(
        np.concatenate(out_v, axis=0),
        np.concatenate(out_f, axis=0),
        None if out_c is None else np.concatenate(out_c, axis=0),
    )
    return remove_isolated_vertices(clipped)


def compute_vertex_normals(mesh: Mesh) -> Mesh:
    """Area-weighted vertex normals (meshData.h:713-736): accumulate the
    unnormalized face cross products, then normalize."""
    v = mesh.vertices
    f = mesh.faces
    if len(f) == 0:
        mesh.normals = np.zeros_like(v)
        return mesh
    from tsdfjax import native

    nat = native.vertex_normals(v, f)
    if nat is not None:
        mesh.normals = nat
        return mesh
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    normals = np.zeros_like(v)
    for k in range(3):
        np.add.at(normals, f[:, k], fn)
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    mesh.normals = normals / np.maximum(lens, 1e-30)
    return mesh


# ---------------------------------------------------------------------------
# File I/O (MeshIO.h:27-99 dispatch-on-extension)
# ---------------------------------------------------------------------------


def save_mesh(mesh: Mesh, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        _save_obj(mesh, path)
    elif ext == ".ply":
        _save_ply(mesh, path)
    elif ext == ".off":
        _save_off(mesh, path)
    else:
        raise ValueError(f"unsupported mesh format {ext!r} (use .obj/.ply/.off)")


def load_mesh(path: str) -> Mesh:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return _load_obj(path)
    if ext == ".ply":
        return _load_ply(path)
    if ext == ".off":
        return _load_off(path)
    raise ValueError(f"unsupported mesh format {ext!r}")


def _save_obj(mesh: Mesh, path: str) -> None:
    from tsdfjax import native

    if native.write_obj(path, mesh.vertices, mesh.faces, mesh.colors, mesh.normals):
        return
    with open(path, "w") as f:
        f.write("# tsdfjax mesh\n")
        if mesh.colors is not None:
            for p, c in zip(mesh.vertices, mesh.colors / 255.0):
                f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n")
        else:
            for p in mesh.vertices:
                f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        if mesh.normals is not None:
            for n in mesh.normals:
                f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for t in mesh.faces + 1:
            if mesh.normals is not None:
                f.write(f"f {t[0]}//{t[0]} {t[1]}//{t[1]} {t[2]}//{t[2]}\n")
            else:
                f.write(f"f {t[0]} {t[1]} {t[2]}\n")


def _load_obj(path: str) -> Mesh:
    verts, faces, colors = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
                if len(parts) >= 7:
                    colors.append([float(x) * 255.0 for x in parts[4:7]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:4]]
                faces.append(idx)
    return Mesh(
        np.array(verts, np.float32),
        np.array(faces, np.int64) if faces else np.zeros((0, 3), np.int64),
        np.array(colors, np.float32) if colors else None,
    )


def _save_ply(mesh: Mesh, path: str) -> None:
    """Binary little-endian PLY with optional uchar colors."""
    n_v, n_f = mesh.num_vertices, mesh.num_faces
    has_c = mesh.colors is not None
    has_n = mesh.normals is not None
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0", f"element vertex {n_v}",
               "property float x", "property float y", "property float z"]
        if has_n:
            hdr += ["property float nx", "property float ny", "property float nz"]
        if has_c:
            hdr += ["property uchar red", "property uchar green", "property uchar blue"]
        hdr += [f"element face {n_f}", "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        cols = [mesh.vertices.astype("<f4")]
        if has_n:
            cols.append(mesh.normals.astype("<f4"))
        rec = np.concatenate(cols, axis=1).astype("<f4").tobytes()
        if has_c:
            # interleave float block and color bytes per vertex
            fbytes = np.concatenate(cols, axis=1).astype("<f4")
            cbytes = np.clip(mesh.colors, 0, 255).astype(np.uint8)
            stride_f = fbytes.shape[1] * 4
            out = bytearray()
            fb = fbytes.tobytes()
            cb = cbytes.tobytes()
            for i in range(n_v):
                out += fb[i * stride_f : (i + 1) * stride_f]
                out += cb[i * 3 : (i + 1) * 3]
            f.write(bytes(out))
        else:
            f.write(rec)
        face_rec = np.empty(n_f, dtype=[("n", "u1"), ("idx", "<i4", 3)])
        face_rec["n"] = 3
        face_rec["idx"] = mesh.faces.astype("<i4")
        f.write(face_rec.tobytes())


def _load_ply(path: str) -> Mesh:
    with open(path, "rb") as f:
        # parse header
        props = []
        n_v = n_f = 0
        fmt = None
        cur_elem = None
        while True:
            line = f.readline().decode().strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                n_v = int(line.split()[2]); cur_elem = "v"
            elif line.startswith("element face"):
                n_f = int(line.split()[2]); cur_elem = "f"
            elif line.startswith("property") and cur_elem == "v":
                parts = line.split()
                props.append((parts[-1], parts[1]))
            elif line == "end_header":
                break
        np_map = {
            "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "<i2", "int16": "<i2", "ushort": "<u2", "uint16": "<u2",
            "int": "<i4", "int32": "<i4", "uint": "<u4", "uint32": "<u4",
        }
        if fmt == "ascii":
            # MeshIO.cpp parses ascii PLY line-by-line with arbitrary
            # vertex property layouts; mirror that via the header's
            # property order
            names = [name for name, _t in props]
            vrows = np.array(
                [f.readline().decode().split() for _ in range(n_v)], np.float64
            ).reshape(n_v, len(names))
            vdata = {name: vrows[:, k] for k, name in enumerate(names)}
            faces = np.array(
                [f.readline().decode().split()[1:4] for _ in range(n_f)],
                np.int64,
            ).reshape(n_f, 3)
        elif fmt == "binary_little_endian":
            dtype = np.dtype([(name, np_map[t]) for name, t in props])
            vrec = np.frombuffer(f.read(dtype.itemsize * n_v), dtype=dtype)
            vdata = {name: vrec[name] for name, _t in props}
            fdt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
            fdata = np.frombuffer(f.read(fdt.itemsize * n_f), dtype=fdt)
            faces = fdata["idx"]
        else:
            raise ValueError(f"unsupported ply format {fmt!r}")
        verts = np.stack([vdata["x"], vdata["y"], vdata["z"]], axis=1)
        colors = None
        if "red" in vdata:
            colors = np.stack(
                [vdata["red"], vdata["green"], vdata["blue"]], axis=1
            ).astype(np.float32)
        normals = None
        if "nx" in vdata:
            normals = np.stack([vdata["nx"], vdata["ny"], vdata["nz"]], axis=1)
        return Mesh(verts, faces, colors, normals)


def _save_off(mesh: Mesh, path: str) -> None:
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{mesh.num_vertices} {mesh.num_faces} 0\n")
        for p in mesh.vertices:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for t in mesh.faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def _load_off(path: str) -> Mesh:
    with open(path) as f:
        assert f.readline().strip() == "OFF"
        n_v, n_f, _ = (int(x) for x in f.readline().split())
        verts = [[float(x) for x in f.readline().split()[:3]] for _ in range(n_v)]
        faces = [[int(x) for x in f.readline().split()[1:4]] for _ in range(n_f)]
    return Mesh(np.array(verts, np.float32), np.array(faces, np.int64))


def extract_mesh(
    volume: TsdfVolume,
    vol_cfg: VolumeConfig,
    max_triangles: int = 1_500_000,
    with_color: bool = False,
    compute_normals: bool = True,
) -> Mesh:
    """One-call pipeline: marching cubes -> weld -> normals."""
    buffers = marching_cubes(
        volume, vol_cfg, max_triangles=max_triangles, with_color=with_color
    )
    mesh = mesh_from_buffers(buffers)
    if not with_color:
        mesh.colors = None
    if compute_normals:
        compute_vertex_normals(mesh)
    return mesh
