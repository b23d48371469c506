"""Minimal mesh file readers: OBJ, OFF, PLY (ascii + binary little-endian).

Replaces torch_geometric.io's readers used by the reference datasets.
Each returns (vertices (n,3) float64, faces (m,3) int64).
"""

from __future__ import annotations

import struct

import numpy as np


def read_obj(path: str):
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [p.split("/")[0] for p in line.split()[1:]]
                idx = [int(i) - 1 for i in idx]
                for k in range(1, len(idx) - 1):   # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def read_off(path: str):
    with open(path, "rb") as f:
        txt = f.read().decode("utf-8", errors="replace")
    tokens = txt.split()
    i = 0
    if tokens[0].startswith("OFF"):
        if tokens[0] == "OFF":
            i = 1
        else:                       # "OFF492 ..." glued header
            tokens[0] = tokens[0][3:]
    nv, nf = int(tokens[i]), int(tokens[i + 1])
    i += 3                          # skip edge count
    verts = np.asarray(tokens[i:i + 3 * nv], np.float64).reshape(nv, 3)
    i += 3 * nv
    faces = []
    for _ in range(nf):
        cnt = int(tokens[i])
        idx = [int(t) for t in tokens[i + 1:i + 1 + cnt]]
        for k in range(1, cnt - 1):
            faces.append([idx[0], idx[k], idx[k + 1]])
        i += 1 + cnt
    return verts, np.asarray(faces, np.int64)


_PLY_TYPES = {
    "char": ("b", 1), "int8": ("b", 1), "uchar": ("B", 1), "uint8": ("B", 1),
    "short": ("h", 2), "int16": ("h", 2), "ushort": ("H", 2), "uint16": ("H", 2),
    "int": ("i", 4), "int32": ("i", 4), "uint": ("I", 4), "uint32": ("I", 4),
    "float": ("f", 4), "float32": ("f", 4), "double": ("d", 8), "float64": ("d", 8),
}


def read_ply(path: str):
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.find(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii", errors="replace").splitlines()
    body = data[header_end:]

    fmt = "ascii"
    elements = []   # (name, count, [(prop_type, prop_name) or ('list', ct, t, name)])
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append([parts[1], int(parts[2]), []])
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
            else:
                elements[-1][2].append((parts[1], parts[2]))

    verts, faces = [], []
    if fmt == "ascii":
        tokens = body.decode("ascii").split()
        ti = 0
        for name, count, props in elements:
            for _ in range(count):
                if name == "vertex":
                    vals = {}
                    for p in props:
                        vals[p[-1]] = float(tokens[ti]); ti += 1
                    verts.append([vals["x"], vals["y"], vals["z"]])
                elif name == "face":
                    for p in props:
                        if p[0] == "list":
                            cnt = int(tokens[ti]); ti += 1
                            idx = [int(tokens[ti + k]) for k in range(cnt)]
                            ti += cnt
                            for k in range(1, cnt - 1):
                                faces.append([idx[0], idx[k], idx[k + 1]])
                        else:
                            ti += 1
                else:
                    ti += len(props)
    else:
        endian = "<" if "little" in fmt else ">"
        off = 0
        for name, count, props in elements:
            for _ in range(count):
                if name == "vertex":
                    vals = {}
                    for p in props:
                        code, sz = _PLY_TYPES[p[0]]
                        (v,) = struct.unpack_from(endian + code, body, off)
                        off += sz
                        vals[p[-1]] = v
                    verts.append([vals["x"], vals["y"], vals["z"]])
                elif name == "face":
                    for p in props:
                        if p[0] == "list":
                            ccode, csz = _PLY_TYPES[p[1]]
                            icode, isz = _PLY_TYPES[p[2]]
                            (cnt,) = struct.unpack_from(endian + ccode, body, off)
                            off += csz
                            idx = list(struct.unpack_from(endian + icode * cnt, body, off))
                            off += isz * cnt
                            for k in range(1, cnt - 1):
                                faces.append([idx[0], idx[k], idx[k + 1]])
                        else:
                            code, sz = _PLY_TYPES[p[0]]
                            off += sz
                else:
                    for p in props:
                        if p[0] == "list":
                            ccode, csz = _PLY_TYPES[p[1]]
                            icode, isz = _PLY_TYPES[p[2]]
                            (cnt,) = struct.unpack_from(endian + ccode, body, off)
                            off += csz + isz * cnt
                        else:
                            off += _PLY_TYPES[p[0]][1]
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)
