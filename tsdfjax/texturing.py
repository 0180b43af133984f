"""Keyframe-projective mesh texturing -> textured_mesh.obj + .mtl.

Replaces the reference's disabled PCL texture-mapping path
(MeshGeneratorMarchingcube.cpp~:109-401, which produced
output/textured_mesh.obj + .mtl from keyframe cameras): every face is
assigned to the keyframe that sees it best (visible, front-facing,
closest to the view axis), its vertices are projected into that
keyframe's image to get UVs, and the keyframe images become the texture
atlas (one material per keyframe, like the PCL path's per-camera
submeshes).

Visibility is tested against the keyframe's own depth map (projective
occlusion check with a tolerance), so surfaces occluded in a view are
not textured from it. Faces no keyframe sees go to an untextured
default material.
"""

from __future__ import annotations

import os

import numpy as np

from tsdfjax.geometry import CameraIntrinsics
from tsdfjax.keyframes import Keyframe, KeyframeManager
from tsdfjax.mesh import Mesh


def _project(points_cam: np.ndarray, cam: CameraIntrinsics):
    z = points_cam[:, 2]
    zs = np.where(z > 1e-9, z, 1e-9)
    u = points_cam[:, 0] * cam.fx / zs + cam.cx
    v = points_cam[:, 1] * cam.fy / zs + cam.cy
    return u, v, z


def assign_faces_to_keyframes(
    mesh: Mesh,
    keyframes: list[Keyframe],
    cam: CameraIntrinsics,
    depth_tol: float = 0.05,
) -> np.ndarray:
    """(num_faces,) index of the best keyframe per face, -1 = none."""
    nf = mesh.num_faces
    centers = mesh.vertices[mesh.faces].mean(axis=1)  # (F, 3)
    fn = np.cross(
        mesh.vertices[mesh.faces[:, 1]] - mesh.vertices[mesh.faces[:, 0]],
        mesh.vertices[mesh.faces[:, 2]] - mesh.vertices[mesh.faces[:, 0]],
    )
    fn_len = np.linalg.norm(fn, axis=1, keepdims=True)
    fn = fn / np.maximum(fn_len, 1e-30)

    best_score = np.full(nf, -np.inf)
    best_kf = np.full(nf, -1, np.int64)
    for k, kf in enumerate(keyframes):
        t_inv = np.linalg.inv(kf.pose)
        pc = centers @ t_inv[:3, :3].T + t_inv[:3, 3]
        u, v, z = _project(pc, cam)
        in_img = (z > 0) & (u >= 1) & (u < cam.width - 1) & (v >= 1) & (v < cam.height - 1)
        view_dir = kf.pose[:3, 2]  # camera forward in world
        facing = -(fn @ view_dir)  # >0 when the face looks at the camera
        vis = in_img & (facing > 0.1)
        if kf.depth_m is not None:
            ui = np.clip(np.round(u).astype(np.int64), 0, cam.width - 1)
            vi = np.clip(np.round(v).astype(np.int64), 0, cam.height - 1)
            d = kf.depth_m[vi, ui]
            vis &= (d > 0) & (z <= d + depth_tol)
        score = np.where(vis, facing, -np.inf)
        better = score > best_score
        best_score = np.where(better, score, best_score)
        best_kf = np.where(better, k, best_kf)
    return best_kf


def save_textured_mesh(
    mesh: Mesh,
    keyframes: KeyframeManager | list[Keyframe],
    cam: CameraIntrinsics,
    obj_path: str,
) -> None:
    """Write OBJ + MTL + per-keyframe texture PNGs next to obj_path."""
    from PIL import Image

    kfs = [kf for kf in keyframes if kf.rgb is not None]
    out_dir = os.path.dirname(obj_path) or "."
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(obj_path))[0]
    mtl_name = stem + ".mtl"

    assign = (
        assign_faces_to_keyframes(mesh, kfs, cam)
        if kfs
        else np.full(mesh.num_faces, -1, np.int64)
    )

    # texture images
    tex_files = []
    for k, kf in enumerate(kfs):
        tex = f"{stem}_tex{k}.png"
        Image.fromarray(np.clip(kf.rgb, 0, 255).astype(np.uint8)).save(
            os.path.join(out_dir, tex)
        )
        tex_files.append(tex)

    # per-face UVs: 3 fresh vt entries per textured face (PCL-style)
    with open(os.path.join(out_dir, mtl_name), "w") as m:
        m.write("# tsdfjax textured mesh materials\n")
        m.write("newmtl untextured\nKd 0.7 0.7 0.7\n\n")
        for k, tex in enumerate(tex_files):
            m.write(f"newmtl kf{k}\nKd 1.0 1.0 1.0\nmap_Kd {tex}\n\n")

    with open(obj_path, "w") as f:
        f.write(f"mtllib {mtl_name}\n")
        for p in mesh.vertices:
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        # vt entries, grouped per keyframe
        vt_index = {}  # (face, corner) -> vt id (1-based)
        vt_count = 0
        vt_lines = []
        for k, kf in enumerate(kfs):
            faces_k = np.nonzero(assign == k)[0]
            if len(faces_k) == 0:
                continue
            t_inv = np.linalg.inv(kf.pose)
            for fi in faces_k:
                for ci, vid in enumerate(mesh.faces[fi]):
                    pc = mesh.vertices[vid] @ t_inv[:3, :3].T + t_inv[:3, 3]
                    u, v, z = _project(pc[None, :], cam)
                    uu = float(np.clip(u[0] / (cam.width - 1), 0, 1))
                    vv = float(np.clip(1.0 - v[0] / (cam.height - 1), 0, 1))
                    vt_count += 1
                    vt_lines.append(f"vt {uu:.6f} {vv:.6f}\n")
                    vt_index[(fi, ci)] = vt_count
        f.writelines(vt_lines)

        # faces grouped by material
        untex = np.nonzero(assign < 0)[0]
        if len(untex):
            f.write("usemtl untextured\n")
            for fi in untex:
                a, b, c = mesh.faces[fi] + 1
                f.write(f"f {a} {b} {c}\n")
        for k in range(len(kfs)):
            faces_k = np.nonzero(assign == k)[0]
            if len(faces_k) == 0:
                continue
            f.write(f"usemtl kf{k}\n")
            for fi in faces_k:
                ids = mesh.faces[fi] + 1
                ts = [vt_index[(fi, ci)] for ci in range(3)]
                f.write(f"f {ids[0]}/{ts[0]} {ids[1]}/{ts[1]} {ids[2]}/{ts[2]}\n")
