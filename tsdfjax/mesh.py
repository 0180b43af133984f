"""Marching-cubes surface extraction + mesh post-processing + OBJ/PLY/OFF I/O.

TPU-first redesign of the reference meshing stack (SURVEY.md §2.4/§2.6):

  - extractIsoSurfaceKernel (marchingcube.cu:138-153) appends triangles
    through a global atomicAdd counter; here surface cells are stream-
    compacted (validity cumsum + binary search / int32 scatter), their
    triangles packed cell-major, and each slab's block written with one
    contiguous dynamic_update_slice — deterministic, race-free, jittable,
    and free of float scatters (see _marching_cubes_impl). A static
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

The extraction is chunked over x-slabs with lax.scan so the peak
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
        # Bound the per-step cell count so slab temporaries stay small,
        # while keeping the SEQUENTIAL scan-step count low: res-1 is
        # usually odd with awkward divisors (511 = 7*73 — a 0.5M-cell
        # target forced slab=1, i.e. 511 scan steps whose per-step
        # overhead alone cost ~3 s at 512^3). When no divisor reaches
        # half the target, pad x with never-observed slices (weight 0 ->
        # case 0 -> no triangles, no duplicates) so the target slab
        # divides exactly. The target also keeps the EXPECTED surface
        # cells per step under the ce_small branch budget: surface
        # density falls ~1/res, so 512^3 affords 2M-cell steps (measured
        # 1.67 s extract, small branch holding at ~7.8k cells/step)
        # while 256^3 wants ~0.4M (measured 1.6 s at slab 5).
        tbits = 21 if n_cells >= 511 else 19
        target = min(max(1, (1 << tbits) // (n_cells * n_cells)), n_cells_x)
        slab = _pick_slab(n_cells_x, target=target)
        if slab < (target + 1) // 2:
            slab = target
            n_pad = (-n_cells_x) % slab
            if n_pad:
                pad_x = [(0, n_pad)] + [(0, 0)] * (tsdf.ndim - 1)
                tsdf = jnp.pad(tsdf, pad_x)
                weight = jnp.pad(weight, pad_x)
                color = jnp.pad(
                    color, [(0, n_pad)] + [(0, 0)] * (color.ndim - 1)
                )
                n_cells_x += n_pad
    assert n_cells_x % slab == 0, "slab must divide the x cell extent"
    n_slabs = n_cells_x // slab

    tri_count = jnp.asarray(TRI_COUNT)
    edge_corners = jnp.asarray(EDGE_CORNERS)
    corner_off = jnp.asarray(_CORNER_OFFSETS)
    x0f = jnp.asarray(x0, jnp.float32)

    # ---- sparse extraction (empty-space skipping + two-level compaction)
    #
    # A slab has slab*(res-1)^2 cells but only ~surface-area many carry
    # triangles. The old path expanded every cell's 12 edge vertices and
    # MAX_TRIS candidates and scatter-wrote them (21 s at 256^3, 22 GB of
    # temporaries at 512^3 on one v5e). Here each slab step:
    #   1. computes the MC case index with a fused 8-corner stencil (no
    #      (cells, 8) materialization),
    #   2. compacts SURFACE CELLS (case not in {0, 255}) — binary search
    #      on the validity cumsum when few, one int32 scatter when many,
    #   3. computes edge vertices / table rows only for compacted cells,
    #   4. packs triangles cell-major with a second small compaction and
    #      writes ONE contiguous dynamic_update_slice at the running
    #      total (no float scatter anywhere).
    # Per-slab empty/small/big branching keeps the common case cheap: an
    # all-empty slab is a no-op, a typical slab takes the CE_SMALL branch,
    # and a plane-parallel wall (worst case: every cell of one x-plane is
    # surface) takes the (res-1)^2-cell branch.
    m_cells = slab * n_cells * n_cells
    ce_big = m_cells  # the big branch compacts losslessly over all cells
    # 8192 is a measured TPU sweet spot: raising it with the slab size
    # (e.g. m_cells/32) made the small-branch emit itself fall off a
    # scatter/gather cliff (19 s at 256^3 vs 1.6 s)
    ce_small = min(8192, ce_big)
    tc_big = ce_big * MAX_TRIS_PER_CELL

    def case_and_cumsum(x_start):
        """Fused stencil: per-cell MC case index (0 where unobserved or
        out of the iso band) + the surface-cell validity cumsum."""
        t_slab = jax.lax.dynamic_slice_in_dim(tsdf, x_start, slab + 1, 0)
        w_slab = jax.lax.dynamic_slice_in_dim(weight, x_start, slab + 1, 0)
        case = jnp.zeros((slab, n_cells, n_cells), jnp.int32)
        obs = jnp.ones((slab, n_cells, n_cells), bool)
        rng = jnp.ones((slab, n_cells, n_cells), bool)
        for k in range(8):
            dx, dy, dz = _CORNER_OFFSETS[k]
            tk = t_slab[dx : dx + slab, dy : dy + n_cells, dz : dz + n_cells]
            wk = w_slab[dx : dx + slab, dy : dy + n_cells, dz : dz + n_cells]
            case = case | ((tk < 0).astype(jnp.int32) << k)
            obs = obs & (wk > 0)
            rng = rng & (jnp.abs(tk) <= iso_threshold)
        case = jnp.where(obs & rng, case, 0).reshape(m_cells)
        valid = (case != 0) & (case != 255)
        ccum = jnp.cumsum(valid.astype(jnp.int32))
        return t_slab, case, valid, ccum

    # All intermediates below keep the LARGE axis minormost (TPU pads the
    # two minor dims to (8, 128) tiles: a (N, 3, 3) layout inflates 42x
    # and OOMs at 512^3, a (9, N) layout pads ~1x).
    tri_table_t = jnp.asarray(TRI_TABLE).reshape(256, MAX_TRIS_PER_CELL * 3).T

    def emit(out_v, out_c, total, x_start, t_slab, case, csrc, n_kept, ce, tc):
        """Rows for the compacted cells csrc (ce slots, n_kept real):
        corner gathers -> edge vertices -> cell-major triangle packing ->
        one contiguous write at the running total. Returns updated
        (9, max+pad) buffers + the exact triangle count and written count."""
        cell_ok = jnp.arange(ce) < n_kept
        csrc = jnp.minimum(csrc, m_cells - 1)
        iz = csrc % n_cells
        iy = (csrc // n_cells) % n_cells
        ix = csrc // (n_cells * n_cells)

        # 8 corner tsdf values per compacted cell, flat-gathered from the
        # (slab+1, res, res) window
        tflat = t_slab.reshape(-1)
        ct = jnp.stack(
            [
                tflat[((ix + dx) * res + (iy + dy)) * res + (iz + dz)]
                for dx, dy, dz in _CORNER_OFFSETS
            ],
            axis=0,
        )  # (8, ce)

        # corner world positions, one (8, ce) array per coordinate
        base3 = (
            (ix + x_start).astype(jnp.float32) + x0f,
            iy.astype(jnp.float32),
            iz.astype(jnp.float32),
        )
        cpos3 = [
            (base3[k][None, :] + corner_off[:, k].astype(jnp.float32)[:, None] + 0.5)
            * cell
            for k in range(3)
        ]

        a_idx = edge_corners[:, 0]
        b_idx = edge_corners[:, 1]
        va = jnp.take(ct, a_idx, axis=0)  # (12, ce); constant-index takes
        vb = jnp.take(ct, b_idx, axis=0)
        denom = vb - va
        # vertexInterp degenerate guards (marchingcube.cu:16-41)
        mu = jnp.where(
            jnp.abs(denom) < 1e-30, 0.5,
            (0.0 - va) / jnp.where(denom == 0, 1.0, denom),
        )
        mu = jnp.where(jnp.abs(va) < 1e-5, 0.0, jnp.where(jnp.abs(vb) < 1e-5, 1.0, mu))
        ev3 = []  # edge-vertex coordinates, (12, ce) each
        for k in range(3):
            pa = jnp.take(cpos3[k], a_idx, axis=0)
            pb = jnp.take(cpos3[k], b_idx, axis=0)
            ev3.append(pa + mu * (pb - pa))

        if with_color:
            c_slab = jax.lax.dynamic_slice_in_dim(color, x_start, slab + 1, 0)
            ec3 = []
            for k in range(3):
                cflat = c_slab[..., k].reshape(-1)
                cc = jnp.stack(
                    [
                        cflat[((ix + dx) * res + (iy + dy)) * res + (iz + dz)]
                        for dx, dy, dz in _CORNER_OFFSETS
                    ],
                    axis=0,
                )  # (8, ce)
                ca = jnp.take(cc, a_idx, axis=0)
                cb = jnp.take(cc, b_idx, axis=0)
                ec3.append(ca + mu * (cb - ca))
        else:
            ec3 = [jnp.zeros((12, ce), jnp.float32)] * 3

        case_c = case[csrc]
        tt_c = jnp.take(tri_table_t, case_c, axis=1)  # (MAX*3, ce)
        ntri_c = jnp.where(cell_ok, tri_count[case_c], 0)
        tcum = jnp.cumsum(ntri_c)
        n_tris = tcum[-1]

        # cell-major triangle packing: scatter the (cell slot, tri index)
        # codes of real triangles to their output positions (int32 only)
        tbase = (tcum - ntri_c)[None, :] + jnp.arange(MAX_TRIS_PER_CELL)[:, None]
        t_ok = jnp.arange(MAX_TRIS_PER_CELL)[:, None] < ntri_c[None, :]
        dest = jnp.where(t_ok, tbase, tc).reshape(-1)
        codes = (
            jnp.arange(ce, dtype=jnp.int32)[None, :] * 8
            + jnp.arange(MAX_TRIS_PER_CELL, dtype=jnp.int32)[:, None]
        ).reshape(-1)
        packed = jnp.zeros(tc, jnp.int32).at[dest].set(codes, mode="drop")
        slot_ok = jnp.arange(tc) < jnp.minimum(n_tris, tc)
        c2 = packed // 8
        t2 = jnp.clip(packed % 8, 0, MAX_TRIS_PER_CELL - 1)
        tt_flat = tt_c.reshape(-1)  # [(t*3+v)*ce + cell]
        edge_idx = []  # per vertex v: flat (edge, cell) index into (12, ce)
        for v in range(3):
            e_v = tt_flat[(t2 * 3 + v) * ce + c2]
            edge_idx.append(jnp.maximum(e_v, 0).astype(jnp.int32) * ce + c2)
        rows_v = jnp.stack(
            [jnp.where(slot_ok, ev3[k].reshape(-1)[idx], 0.0)
             for idx in edge_idx for k in range(3)],
            axis=0,
        )  # (9, tc) in (vertex, coord) order
        rows_c = jnp.stack(
            [jnp.where(slot_ok, ec3[k].reshape(-1)[idx], 0.0)
             for idx in edge_idx for k in range(3)],
            axis=0,
        )

        offset = jnp.minimum(total, max_triangles)
        out_v = jax.lax.dynamic_update_slice(out_v, rows_v, (0, offset))
        out_c = jax.lax.dynamic_update_slice(out_c, rows_c, (0, offset))
        return out_v, out_c, n_tris, jnp.minimum(n_tris, tc)

    # Per-step triangle cap: each 8192-cell chunk can emit at most
    # ce_small * MAX_TRIS_PER_CELL rows, so a chunk never drops by
    # construction; only the global max_triangles cap drops (counted).
    tc_small = ce_small * MAX_TRIS_PER_CELL

    # Output padded by one write block: each chunk writes its full block
    # at the running total; rows past the chunk's real count are zeros
    # the NEXT chunk overwrites, and rows past max_triangles land in the
    # pad (the reference's drop-at-capacity, config.ini:48).
    #
    # STRUCTURE NOTE (round-5 perf): the previous empty/small/big
    # lax.switch passed the (9, max+pad) output buffers through the
    # branch boundary, and XLA COPIES cond/switch operands — measured
    # 21.7 ms PER SLAB STEP at 512^3 (73 copies = 1.6 s, ~the entire
    # extraction cost). Now every step unconditionally emits one
    # 8192-cell chunk (an all-empty slab emits a zero block — the same
    # cost as the old empty branch once the copies are gone), and slabs
    # with more surface cells drain the remainder in a while_loop whose
    # carry (unlike cond operands) aliases in place. Triangle order is
    # identical to the old path: cell-major, chunks ascending.
    out_v = jnp.zeros((9, max_triangles + tc_small), jnp.float32)
    out_c = jnp.zeros((9, max_triangles + tc_small), jnp.float32)
    total0 = jnp.array(0, jnp.int32)
    dropped0 = jnp.array(0, jnp.int32)
    if axis_name is not None:
        # under shard_map the carry reads the sharded slab -> varying
        out_v, out_c, total0, dropped0 = jax.lax.pvary(
            (out_v, out_c, total0, dropped0), axis_name
        )

    def scan_body(carry, x_start):
        out_v, out_c, total, dropped = carry
        t_slab, case, valid, ccum = case_and_cumsum(x_start)
        n_valid = ccum[-1]

        def emit_chunk(out_v, out_c, total, dropped, base):
            # surface cells [base, base+ce_small) by binary search on
            # the validity cumsum
            csrc = jnp.searchsorted(
                ccum, base + jnp.arange(ce_small, dtype=jnp.int32) + 1,
                side="left",
            )
            n_here = jnp.clip(n_valid - base, 0, ce_small)
            out_v, out_c, n_tris, written = emit(
                out_v, out_c, total, x_start, t_slab, case, csrc,
                n_here, ce_small, tc_small,
            )
            return out_v, out_c, total + written, dropped + n_tris - written

        out_v, out_c, total, dropped = emit_chunk(
            out_v, out_c, total, dropped, jnp.array(0, jnp.int32)
        )

        def more(c):
            return c[4] < n_valid

        def drain(c):
            out_v, out_c, total, dropped, base = c
            out_v, out_c, total, dropped = emit_chunk(
                out_v, out_c, total, dropped, base
            )
            return out_v, out_c, total, dropped, base + ce_small

        out_v, out_c, total, dropped, _ = jax.lax.while_loop(
            more, drain,
            (out_v, out_c, total, dropped,
             jnp.array(ce_small, jnp.int32) + 0 * n_valid),
        )
        return (out_v, out_c, total, dropped), None

    # Occupancy band (EXACT): a slab whose own x-slices are all
    # unobserved (weight == 0) yields case 0 for every cell — each cell
    # has at least one unobserved corner — so the loop only needs to
    # cover [first, last] occupied slabs. Unobserved trailing rows of
    # the output stay at their zero initialization, the same invariant
    # the in-loop zero-block writes maintain.
    w_any = jnp.any(weight[: n_slabs * slab] > 0, axis=(1, 2))
    occ_slab = jnp.any(w_any.reshape(n_slabs, slab), axis=1)
    any_occ = jnp.any(occ_slab)
    blk_lo = jnp.where(any_occ, jnp.argmax(occ_slab), 0).astype(jnp.int32)
    blk_hi = jnp.where(
        any_occ, n_slabs - jnp.argmax(occ_slab[::-1]), 0
    ).astype(jnp.int32)

    def loop_body(b, carry):
        return scan_body(carry, b * slab)[0]

    out_v, out_c, total, dropped = jax.lax.fori_loop(
        blk_lo, blk_hi, loop_body, (out_v, out_c, total0, dropped0)
    )

    count = jnp.minimum(total, max_triangles)
    return MeshBuffers(
        vertices=out_v[:, :max_triangles].T.reshape(max_triangles, 3, 3),
        colors=out_c[:, :max_triangles].T.reshape(max_triangles, 3, 3),
        count=count,
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


_PACK_K = 23168  # (2K+1)^2 < 2^31: largest |quantized coord| packable


@partial(jax.jit, static_argnames=("with_color", "packed"))
def _weld_device_impl(vertices, colors, count, merge_eps, with_color,
                      packed=False):
    """Sort-based vertex weld entirely on device.

    Same quantized-grid 'approx' merge semantics as weld_mesh
    (meshData.cpp:198-260), but expressed as a lexicographic lax.sort of
    the quantized coordinates + segment heads + scatter, so the triangle
    soup never leaves the device: the host transfer shrinks from
    36 B/corner (soup) to the indexed mesh (unique vertices + int32
    faces), which is what dominates extraction time through the TPU
    tunnel. TPUs have no int64, hence 3 int32 sort keys instead of one
    packed key.
    """
    n_corners = vertices.shape[0] * 3
    v = vertices.reshape(n_corners, 3)
    valid = jnp.arange(n_corners, dtype=jnp.int32) < count * 3
    q = jnp.round(v / merge_eps).astype(jnp.int32)
    idx = jnp.arange(n_corners, dtype=jnp.int32)
    # idx participates as the last sort key so equal-cell runs are
    # ordered by original corner index; the representative vertex of each
    # cell is then the FIRST original occurrence (scatter-min below),
    # matching the host weld's np.unique(return_index) / native
    # first-seen semantics — deterministic across backends, unlike a
    # last-write-wins scatter over an unstable sort.
    if packed:
        # (qz, qy) packed into ONE order-preserving int32 key — the TPU
        # bitonic sort cost scales with key count, and 3 keys beat 4 by
        # ~25%. The caller guarantees |q| <= _PACK_K (checked against
        # the actual coordinate range host-side), so
        # (q + K) * (2K + 1) + (q + K) <= (2K+1)^2 - 1 < 2^31.
        K = jnp.int32(_PACK_K)
        sentinel = jnp.int32(0x7FFFFFFF)
        qzy = jnp.where(
            valid, (q[:, 2] + K) * (2 * _PACK_K + 1) + (q[:, 1] + K),
            sentinel,
        )
        qx = jnp.where(valid, q[:, 0], sentinel)
        szy, sx, order = jax.lax.sort((qzy, qx, idx), num_keys=3)
        head = jnp.concatenate([
            jnp.ones((1,), bool),
            (szy[1:] != szy[:-1]) | (sx[1:] != sx[:-1]),
        ])
        last_key = szy
    else:
        sentinel = jnp.int32(1 << 30)
        qx = jnp.where(valid, q[:, 0], sentinel)
        qy = jnp.where(valid, q[:, 1], sentinel)
        qz = jnp.where(valid, q[:, 2], sentinel)
        sz, sy, sx, order = jax.lax.sort((qz, qy, qx, idx), num_keys=4)
        head = jnp.concatenate([
            jnp.ones((1,), bool),
            (sz[1:] != sz[:-1]) | (sy[1:] != sy[:-1]) | (sx[1:] != sx[:-1]),
        ])
        last_key = sz
    uid = jnp.cumsum(head.astype(jnp.int32)) - 1
    n_unique = jnp.sum((head & (last_key != sentinel)).astype(jnp.int32))
    inverse = jnp.zeros((n_corners,), jnp.int32).at[order].set(uid)
    rep = jnp.full((n_corners,), n_corners - 1, jnp.int32).at[uid].min(order)
    out_v = v[rep]
    faces = inverse.reshape(-1, 3)
    out_c = None
    if with_color:
        c = colors.reshape(n_corners, 3)
        out_c = c[rep]
    return out_v, out_c, faces, n_unique


def _dedup_faces(f: np.ndarray) -> np.ndarray:
    """Drop degenerate then duplicate faces (meshData.cpp:42 semantics)."""
    good = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    f = f[good]
    if len(f):
        sorted_f = np.sort(f, axis=1)
        _, keep = np.unique(sorted_f, axis=0, return_index=True)
        f = f[np.sort(keep)]
    return f


def mesh_from_buffers_device(
    buffers: MeshBuffers, merge_eps: float = 1e-4, with_color: bool = True,
    coord_bound: float | None = None,
) -> Mesh:
    """mesh_from_buffers with the weld executed on device; transfers only
    the indexed result (unique vertices + faces). Duplicate-face removal
    stays on host where it is cheap on int32 indices.

    `coord_bound`: known bound on |vertex coordinate| (e.g. the volume
    extent) — lets the packed-key check skip a device reduction +
    readback (a couple hundred ms through the tunneled TPU)."""
    n = int(buffers.count)
    if n == 0:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    # Slice the static max-triangle budget down to a bucket around the
    # ACTUAL triangle count before the jitted sort: the budget is often
    # >10x the real mesh (6.5M vs ~0.5M at 512^3), and the sort is the
    # weld's dominant cost. Buckets are multiples of 2^17 (finer than
    # pow2 — a 524k mesh sorts 655k slots instead of 1M) with a handful
    # of distinct compiles.
    step = 1 << 17
    m = min(buffers.vertices.shape[0], max(-(-n // step) * step, 1024))
    # 3-key packed sort when every quantized coordinate fits the packing
    # range (checked against the caller's bound, or the true coordinate
    # extent via one scalar readback)
    vmax = (
        float(coord_bound) if coord_bound is not None
        else float(jnp.max(jnp.abs(buffers.vertices[:m])))
    )
    packed = round(vmax / merge_eps) + 1 < _PACK_K
    out_v, out_c, faces, n_unique = _weld_device_impl(
        buffers.vertices[:m], buffers.colors[:m], buffers.count, merge_eps,
        with_color, packed=packed,
    )
    nu = int(n_unique)
    verts = np.asarray(out_v[:nu])
    colors = np.asarray(out_c[:nu]) if with_color else None
    f = np.asarray(faces[:n]).astype(np.int64)
    return Mesh(verts, _dedup_faces(f), colors)


def weld_mesh(tri_vertices: np.ndarray, tri_colors: np.ndarray | None,
              merge_eps: float, mode: str = "approx") -> Mesh:
    """Vertex weld + duplicate-face removal (mergeCloseVertices,
    meshData.cpp:198-262).

    mode='approx' (the default, and what the reference's mesh saver
    actually calls): vertices sharing a quantized eps-grid cell merge.
    mode='exact': the reference's approx=false mode — merge into the
    NEAREST kept vertex within true eps distance, searched over the 27
    neighboring cells, so pairs straddling a cell boundary also merge.
    (Nearest-match variant: the reference takes the FIRST kept vertex
    within eps, strict <, in cell-scan order, so assignments can differ
    in multi-candidate / exact-eps tie cases — same semantics otherwise.)

    Uses the native C++ path (tsdfjax.native / native/meshops.cpp) when
    available — ~10x faster than the NumPy fallback at reference mesh
    sizes (1.5M triangles); exact mode is single-threaded like the
    reference's."""
    tri_vertices = np.asarray(tri_vertices).reshape(-1, 3)
    if tri_colors is not None:
        tri_colors = np.asarray(tri_colors).reshape(-1, 3)
    if len(tri_vertices) == 0:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    from tsdfjax import native

    nat = native.weld(tri_vertices, tri_colors, merge_eps,
                      exact=(mode == "exact"))
    if nat is not None:
        verts, colors, faces = nat
        return Mesh(verts, faces, colors)
    if mode == "exact":
        return _weld_exact_numpy(tri_vertices, tri_colors, merge_eps)
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


def _weld_exact_numpy(tri_vertices, tri_colors, merge_eps) -> Mesh:
    """Pure-python fallback for the exact-NN weld mode (slow; the native
    library is the intended path — this exists so tests/semantics don't
    depend on a toolchain)."""
    inv = 1.0 / merge_eps
    eps2 = merge_eps * merge_eps
    grid: dict[tuple, list[int]] = {}
    rep: list[int] = []
    local = np.empty(len(tri_vertices), np.int64)
    for i, p in enumerate(tri_vertices):
        c = tuple(np.round(p * inv).astype(np.int64))
        best, best_d2 = -1, eps2
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    for v in grid.get((c[0] + dx, c[1] + dy, c[2] + dz), ()):
                        d2 = float(((p - tri_vertices[rep[v]]) ** 2).sum())
                        if d2 <= best_d2:
                            best, best_d2 = v, d2
        if best >= 0:
            local[i] = best
        else:
            local[i] = len(rep)
            grid.setdefault(c, []).append(len(rep))
            rep.append(i)
    rep_a = np.asarray(rep)
    vertices = tri_vertices[rep_a]
    colors = None if tri_colors is None else tri_colors[rep_a]
    faces = _dedup_faces(local.reshape(-1, 3))
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
        elif fmt in ("binary_little_endian", "binary_big_endian"):
            # header-declared property layouts, either endianness — the
            # reference's plyHeader.h/MeshIO.cpp:7-660 parse these
            # generally; byte order swaps via the numpy dtype prefix
            bo = "<" if fmt == "binary_little_endian" else ">"
            dtype = np.dtype(
                [(name, np_map[t].replace("<", bo)) for name, t in props]
            )
            vrec = np.frombuffer(f.read(dtype.itemsize * n_v), dtype=dtype)
            vdata = {name: vrec[name] for name, _t in props}
            fdt = np.dtype([("n", "u1"), ("idx", f"{bo}i4", 3)])
            fdata = np.frombuffer(f.read(fdt.itemsize * n_f), dtype=fdt)
            faces = fdata["idx"].astype(np.int64)
        else:
            raise ValueError(
                f"unsupported ply format {fmt!r} (ascii, "
                "binary_little_endian and binary_big_endian are supported)"
            )
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
    device_weld: bool = False,
) -> Mesh:
    """One-call pipeline: marching cubes -> weld -> normals.

    device_weld=True welds on device and transfers only the indexed mesh
    — ~2-4x less D2H volume, the dominant cost on a tunneled TPU; the
    host weld stays the default for bit-stable parity with the sharded
    extraction tests."""
    buffers = marching_cubes(
        volume, vol_cfg, max_triangles=max_triangles, with_color=with_color
    )
    if device_weld:
        mesh = mesh_from_buffers_device(
            buffers, with_color=with_color,
            coord_bound=vol_cfg.size_m + 1.0,
        )
    else:
        mesh = mesh_from_buffers(buffers)
    if not with_color:
        mesh.colors = None
    if compute_normals:
        compute_vertex_normals(mesh)
    return mesh
