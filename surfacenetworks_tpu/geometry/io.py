"""Mesh file I/O: Wavefront OBJ and ascii PLY.

Replaces the reference's ``utils/mesh.py:136-223`` (load_obj / save_as_ply /
save_as_obj / ply_to_numpy) and the plyfile/libigl readers, with no external
dependencies.  All loaders return ``(V, F)`` as ``float64 [N,3]`` / ``int32
[M,3]`` NumPy arrays.
"""

from __future__ import annotations

import numpy as np


def load_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read an OBJ file (v/f records; f entries may be 'i', 'i/t', 'i/t/n').

    Reference parity: utils/mesh.py:202-223 (load_obj).
    """
    verts: list[list[float]] = []
    faces: list[list[int]] = []
    with open(path) as fh:
        for line in fh:
            if not line or line[0] == "#":
                continue
            parts = line.strip().split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(parts[i + 1]) for i in range(3)])
            elif parts[0] == "f":
                face = [int(tok.split("/")[0]) - 1 for tok in parts[1:]]
                faces.append(face)
    V = np.asarray(verts, dtype=np.float64)
    F = np.asarray(faces, dtype=np.int32)
    return V, F


def save_obj(path: str, V: np.ndarray, F: np.ndarray, skip_zero_rows: bool = False) -> None:
    """Write an OBJ file.

    ``skip_zero_rows`` reproduces the reference behaviour of dropping all-zero
    (padded) vertices/faces (utils/mesh.py:170-183).
    """
    V = np.asarray(V)
    F = np.asarray(F)
    with open(path, "w") as fh:
        for row in V:
            if skip_zero_rows and np.abs(row).sum() == 0:
                continue
            fh.write(f"v {row[0]} {row[1]} {row[2]}\n")
        for row in F:
            if skip_zero_rows and np.abs(row).sum() == 0:
                continue
            fh.write(f"f {row[0] + 1} {row[1] + 1} {row[2] + 1}\n")


def load_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read an ascii PLY file with vertex x/y/z properties and list faces.

    Handles the layout of ``meshes/cube.ply`` in the reference repo (ascii 1.0,
    ``element vertex`` with x/y/z leading floats, ``element face`` with a list
    property whose first entry is the vertex count).
    """
    with open(path) as fh:
        line = fh.readline().strip()
        if line != "ply":
            raise ValueError(f"{path}: not a PLY file")
        n_vert = n_face = 0
        elements: list[tuple[str, int]] = []
        while True:
            line = fh.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            tok = line.strip().split()
            if not tok:
                continue
            if tok[0] == "format" and tok[1] != "ascii":
                raise ValueError(f"{path}: only ascii PLY supported, got {tok[1]}")
            if tok[0] == "element":
                elements.append((tok[1], int(tok[2])))
                if tok[1] == "vertex":
                    n_vert = int(tok[2])
                elif tok[1] == "face":
                    n_face = int(tok[2])
            if tok[0] == "end_header":
                break
        verts = np.zeros((n_vert, 3), dtype=np.float64)
        faces: list[list[int]] = []
        for name, count in elements:
            if name == "vertex":
                for i in range(count):
                    vals = fh.readline().split()
                    verts[i] = [float(vals[0]), float(vals[1]), float(vals[2])]
            elif name == "face":
                for _ in range(count):
                    vals = fh.readline().split()
                    k = int(vals[0])
                    faces.append([int(v) for v in vals[1 : 1 + k]])
            else:  # skip unknown element rows
                for _ in range(count):
                    fh.readline()
    F = np.asarray(faces, dtype=np.int32)
    return verts, F


def save_ply(path: str, V: np.ndarray, F: np.ndarray) -> None:
    """Write an ascii PLY (reference parity: utils/mesh.py:145-167 save_as_ply)."""
    V = np.asarray(V)
    F = np.asarray(F)
    header = (
        "ply\nformat ascii 1.0\n"
        f"element vertex {V.shape[0]}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {F.shape[0]}\n"
        "property list uchar uint vertex_indices\nend_header\n"
    )
    with open(path, "w") as fh:
        fh.write(header)
        for row in V:
            fh.write(f"{row[0]} {row[1]} {row[2]}\n")
        for row in F:
            fh.write(f"3 {row[0]} {row[1]} {row[2]}\n")
