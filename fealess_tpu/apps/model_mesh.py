"""Minimal OBJ mesh + wireframe reprojection overlay.

Reimplements ``CModelMesh`` (reference test/model_mesh.cpp:4-126): parse
``v``/``vt``/``vn``/``f`` lines (vertices divided by ``model_scale``,
1-based face indices), project vertices with the pinhole camera and draw
every triangle edge.  Projection is vectorized NumPy (the reference calls
cv::projectPoints per frame); drawing uses cv2.line like the reference.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ObjMesh:
    vertices: np.ndarray       # (V, 3) f32
    faces: np.ndarray          # (F, 3) int32 vertex ids (0-based)
    texcoords: Optional[np.ndarray] = None
    normals: Optional[np.ndarray] = None


def load_obj(path: str, model_scale: float = 1.0) -> ObjMesh:
    """Parse an OBJ file; vertices are divided by ``model_scale``
    (model_mesh.cpp:35)."""
    vs: List[Tuple[float, float, float]] = []
    vts: List[Tuple[float, float]] = []
    vns: List[Tuple[float, float, float]] = []
    fs: List[Tuple[int, int, int]] = []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                x, y, z = (float(v) for v in parts[1:4])
                vs.append((x / model_scale, y / model_scale,
                           z / model_scale))
            elif tag == "vt":
                vts.append((float(parts[1]), float(parts[2])))
            elif tag == "vn":
                vns.append(tuple(float(v) for v in parts[1:4]))
            elif tag == "f":
                ids = [int(p.split("/")[0]) - 1 for p in parts[1:4]]
                fs.append(tuple(ids))
    return ObjMesh(
        vertices=np.asarray(vs, np.float32).reshape(-1, 3),
        faces=np.asarray(fs, np.int32).reshape(-1, 3),
        texcoords=np.asarray(vts, np.float32).reshape(-1, 2)
        if vts else None,
        normals=np.asarray(vns, np.float32).reshape(-1, 3)
        if vns else None)


def project_vertices(mesh: ObjMesh, k: np.ndarray, r: np.ndarray,
                     t: np.ndarray) -> np.ndarray:
    """Pinhole projection of all vertices -> (V, 2) pixel coords
    (cv::projectPoints without distortion, model_mesh.cpp:73/95)."""
    cam = mesh.vertices @ np.asarray(r, np.float32).T \
        + np.asarray(t, np.float32)
    z = np.where(np.abs(cam[:, 2]) < 1e-9, 1e-9, cam[:, 2])
    u = k[0, 0] * cam[:, 0] / z + k[0, 2]
    v = k[1, 1] * cam[:, 1] / z + k[1, 2]
    return np.stack([u, v], axis=-1)


def draw_wireframe(image: np.ndarray, mesh: ObjMesh, k: np.ndarray,
                   pose_4x4: np.ndarray,
                   color=(0, 0, 255)) -> np.ndarray:
    """Overlay the mesh wireframe for a world2cam pose (CModelMesh::Mesh:
    all three edges of every face; model_mesh.cpp:84-90).  Returns the
    image (drawn in place)."""
    import cv2
    r = np.asarray(pose_4x4, np.float64)[:3, :3]
    t = np.asarray(pose_4x4, np.float64)[:3, 3]
    pts = project_vertices(mesh, np.asarray(k, np.float64), r, t)
    pts_i = np.round(pts).astype(np.int64)
    h, w = image.shape[:2]
    ok = ((pts_i[:, 0] > -10 * w) & (pts_i[:, 0] < 10 * w)
          & (pts_i[:, 1] > -10 * h) & (pts_i[:, 1] < 10 * h))
    for f in mesh.faces:
        a, b, c = int(f[0]), int(f[1]), int(f[2])
        if not (ok[a] and ok[b] and ok[c]):
            continue
        cv2.line(image, tuple(pts_i[a]), tuple(pts_i[b]), color)
        cv2.line(image, tuple(pts_i[a]), tuple(pts_i[c]), color)
        cv2.line(image, tuple(pts_i[c]), tuple(pts_i[b]), color)
    return image
