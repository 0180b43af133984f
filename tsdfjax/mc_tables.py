"""Marching-cubes case tables, generated at import from first principles.

Instead of embedding the classic Bourke edgeTable/triTable (the reference
ships them verbatim in marchingcube_table.h), we DERIVE an equivalent
triangulation for all 256 corner-sign configurations by tracing the
iso-contour cycles over the cube's faces:

  * each cube edge whose two corners have opposite inside/outside signs
    carries one iso-vertex;
  * on every face, walking the face boundary splits the crossed edges
    into pairs that bound maximal arcs of INSIDE corners — each pair is
    one contour segment on that face (ambiguous faces resolve to
    "separate the two inside corners", a consistent choice);
  * every crossed edge borders exactly two faces, so the segments chain
    into disjoint cycles = the iso-polygons of the cell;
  * each polygon is fan-triangulated and oriented so triangle normals
    point toward the OUTSIDE (positive-TSDF / free-space) corners,
    matching the visible-surface convention of the reference's raycast
    gradient normals.

Corner/edge numbering follows the standard convention (corner k at bit
k; edge k connecting the canonical corner pairs) so the generated table
is drop-in comparable with any classic implementation.
"""

from __future__ import annotations

import numpy as np

# corner positions (x, y, z), corner index = bit index
CORNER_POS = np.array(
    [
        [0, 0, 0],  # 0
        [1, 0, 0],  # 1
        [1, 1, 0],  # 2
        [0, 1, 0],  # 3
        [0, 0, 1],  # 4
        [1, 0, 1],  # 5
        [1, 1, 1],  # 6
        [0, 1, 1],  # 7
    ],
    dtype=np.float32,
)

# edge k connects EDGE_CORNERS[k] = (a, b)
EDGE_CORNERS = np.array(
    [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
    dtype=np.int32,
)

# each face as its boundary corner cycle, ordered CCW seen from OUTSIDE
# the cube (outward normal). The edge between consecutive corners is a
# cube edge.
_FACES = [
    [0, 3, 2, 1],  # z=0, normal -z
    [4, 5, 6, 7],  # z=1, normal +z
    [0, 1, 5, 4],  # y=0, normal -y
    [3, 7, 6, 2],  # y=1, normal +y
    [0, 4, 7, 3],  # x=0, normal -x
    [1, 2, 6, 5],  # x=1, normal +x
]

_EDGE_OF = {}
for _e, (_a, _b) in enumerate(EDGE_CORNERS):
    _EDGE_OF[(int(_a), int(_b))] = _e
    _EDGE_OF[(int(_b), int(_a))] = _e


def _face_segments(case: int, face: list[int]) -> list[tuple[int, int]]:
    """Contour segments on one face: pairs of crossed edges delimiting
    maximal arcs of inside corners along the face boundary."""
    n = len(face)
    inside = [(case >> c) & 1 for c in face]
    if all(inside) or not any(inside):
        return []
    segs = []
    # walk the boundary; a maximal inside-arc starts at a 0->1 transition
    # (entry edge) and ends at the next 1->0 transition (exit edge)
    for s in range(n):
        if inside[s] and not inside[(s - 1) % n]:
            # arc starts at corner face[s]; entry edge between s-1 and s
            entry = _EDGE_OF[(face[(s - 1) % n], face[s])]
            t = s
            while inside[(t + 1) % n]:
                t = (t + 1) % n
            exit_e = _EDGE_OF[(face[t], face[(t + 1) % n])]
            segs.append((entry, exit_e))
    return segs


def _build_case(case: int) -> list[list[int]]:
    """All triangles (as edge-index triples) for one configuration."""
    # adjacency: each crossed edge appears in exactly two segments
    segs: list[tuple[int, int]] = []
    for face in _FACES:
        segs.extend(_face_segments(case, face))
    if not segs:
        return []
    adj: dict[int, list[int]] = {}
    for a, b in segs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    # trace cycles
    unused = {tuple(sorted(s)) for s in segs}
    cycles = []
    while unused:
        a0, b0 = next(iter(unused))
        cycle = [a0]
        prev, cur = a0, b0
        unused.discard(tuple(sorted((a0, b0))))
        while cur != cycle[0]:
            cycle.append(cur)
            nxts = [x for x in adj[cur] if tuple(sorted((cur, x))) in unused]
            assert nxts, f"open contour in case {case}"
            nxt = nxts[0]
            unused.discard(tuple(sorted((cur, nxt))))
            prev, cur = cur, nxt
        cycles.append(cycle)

    # orient + fan-triangulate each polygon
    inside_corners = [c for c in range(8) if (case >> c) & 1]
    outside_corners = [c for c in range(8) if not ((case >> c) & 1)]
    ci = CORNER_POS[inside_corners].mean(axis=0)
    co = CORNER_POS[outside_corners].mean(axis=0)
    out_dir = co - ci

    tris = []
    for cycle in cycles:
        pts = np.array([CORNER_POS[EDGE_CORNERS[e]].mean(axis=0) for e in cycle])
        # polygon normal via Newell's method
        normal = np.zeros(3)
        for i in range(len(pts)):
            p, q = pts[i], pts[(i + 1) % len(pts)]
            normal += np.cross(p, q)
        if np.dot(normal, out_dir) < 0:
            cycle = cycle[::-1]
        for i in range(1, len(cycle) - 1):
            tris.append([cycle[0], cycle[i], cycle[i + 1]])
    return tris


def _generate():
    max_tris = 0
    all_cases = []
    for case in range(256):
        tris = _build_case(case)
        all_cases.append(tris)
        max_tris = max(max_tris, len(tris))
    tri_table = np.full((256, max_tris * 3), -1, dtype=np.int32)
    count_table = np.zeros(256, dtype=np.int32)
    for case, tris in enumerate(all_cases):
        count_table[case] = len(tris)
        flat = [e for t in tris for e in t]
        tri_table[case, : len(flat)] = flat
    edge_table = np.zeros(256, dtype=np.int32)
    for case in range(256):
        for e, (a, b) in enumerate(EDGE_CORNERS):
            if ((case >> a) & 1) != ((case >> b) & 1):
                edge_table[case] |= 1 << e
    return tri_table, count_table, edge_table, max_tris


TRI_TABLE, TRI_COUNT, EDGE_TABLE, MAX_TRIS_PER_CELL = _generate()
