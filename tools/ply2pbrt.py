#!/usr/bin/env python
"""PLY mesh -> pbrt 'Shape "trianglemesh"' text.

Replacement for /root/reference/tools/ply2pbrt.c (which uses Greg Turk's C
PLY library); this reads ascii and binary-little-endian PLY directly.
"""
import struct
import sys


def read_ply(path):
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply", "not a PLY file"
        fmt = None
        elements = []  # (name, count, [(type, prop)])
        cur = None
        while True:
            line = f.readline().strip()
            if line == b"end_header":
                break
            parts = line.split()
            if not parts:
                continue
            if parts[0] == b"format":
                fmt = parts[1].decode()
            elif parts[0] == b"element":
                cur = (parts[1].decode(), int(parts[2]), [])
                elements.append(cur)
            elif parts[0] == b"property" and cur is not None:
                if parts[1] == b"list":
                    cur[2].append(("list", parts[2].decode(),
                                   parts[3].decode(), parts[4].decode()))
                else:
                    cur[2].append((parts[1].decode(), parts[2].decode()))

        sizes = {"char": 1, "uchar": 1, "int8": 1, "uint8": 1,
                 "short": 2, "ushort": 2, "int16": 2, "uint16": 2,
                 "int": 4, "uint": 4, "int32": 4, "uint32": 4,
                 "float": 4, "float32": 4, "double": 8, "float64": 8}
        fmts = {"char": "b", "uchar": "B", "int8": "b", "uint8": "B",
                "short": "h", "ushort": "H", "int16": "h", "uint16": "H",
                "int": "i", "uint": "I", "int32": "i", "uint32": "I",
                "float": "f", "float32": "f", "double": "d", "float64": "d"}

        verts, faces, normals, uvs = [], [], [], []
        for name, count, props in elements:
            for _ in range(count):
                if fmt == "ascii":
                    vals = f.readline().split()
                    vi = 0
                    rec = {}
                    for pr in props:
                        if pr[0] == "list":
                            n = int(vals[vi]); vi += 1
                            rec[pr[3]] = [int(x) for x in vals[vi:vi + n]]
                            vi += n
                        else:
                            rec[pr[1]] = float(vals[vi]); vi += 1
                else:
                    rec = {}
                    for pr in props:
                        if pr[0] == "list":
                            n = struct.unpack("<" + fmts[pr[1]],
                                              f.read(sizes[pr[1]]))[0]
                            rec[pr[3]] = list(struct.unpack(
                                "<" + fmts[pr[2]] * n, f.read(sizes[pr[2]] * n)))
                        else:
                            rec[pr[1]] = struct.unpack(
                                "<" + fmts[pr[0]], f.read(sizes[pr[0]]))[0]
                if name == "vertex":
                    verts.append((rec["x"], rec["y"], rec["z"]))
                    if "nx" in rec:
                        normals.append((rec["nx"], rec["ny"], rec["nz"]))
                    if "u" in rec:
                        uvs.append((rec["u"], rec["v"]))
                    elif "s" in rec:
                        uvs.append((rec["s"], rec["t"]))
                elif name == "face":
                    idx = rec.get("vertex_indices") or rec.get("vertex_index")
                    for k in range(1, len(idx) - 1):  # fan-triangulate
                        faces.append((idx[0], idx[k], idx[k + 1]))
    return verts, faces, normals, uvs


def main():
    if len(sys.argv) != 2 and len(sys.argv) != 3:
        print("usage: ply2pbrt.py in.ply [out.pbrt]")
        sys.exit(1)
    verts, faces, normals, uvs = read_ply(sys.argv[1])
    out = open(sys.argv[2], "w") if len(sys.argv) == 3 else sys.stdout
    out.write('Shape "trianglemesh"\n "integer indices" [\n')
    for a, b, c in faces:
        out.write(f"  {a} {b} {c}\n")
    out.write(' ]\n "point P" [\n')
    for x, y, z in verts:
        out.write(f"  {x:.7g} {y:.7g} {z:.7g}\n")
    out.write(" ]\n")
    if normals:
        out.write(' "normal N" [\n')
        for x, y, z in normals:
            out.write(f"  {x:.7g} {y:.7g} {z:.7g}\n")
        out.write(" ]\n")
    if uvs:
        out.write(' "float uv" [\n')
        for u, v in uvs:
            out.write(f"  {u:.7g} {v:.7g}\n")
        out.write(" ]\n")
    if out is not sys.stdout:
        out.close()
        print(f"wrote {sys.argv[2]}: {len(verts)} verts, {len(faces)} tris")


if __name__ == "__main__":
    main()
