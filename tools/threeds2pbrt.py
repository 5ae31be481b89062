#!/usr/bin/env python
"""3DS -> pbrt scene converter: the analogue of the reference's 3ds2lrt
tool (/root/reference/tools/3ds2lrt.c, which wraps lib3ds). Pure-python
binary .3ds chunk parser — extracts every mesh (vertex list 0x4110, face
list 0x4120, mesh matrix 0x4160) plus point lights (0x4600) and emits
trianglemesh / LightSource stanzas."""
import argparse
import struct
import sys


def parse_3ds(data):
    meshes = []     # (name, verts [(x,y,z)], faces [(a,b,c)])
    lights = []     # (x, y, z)

    def read_cstr(pos):
        end = data.index(b"\0", pos)
        return data[pos:end].decode("latin-1"), end + 1

    def walk(pos, end, objname=None):
        cur = {"name": objname, "verts": [], "faces": []}
        emitted = False
        while pos + 6 <= end:
            cid, ln = struct.unpack_from("<HI", data, pos)
            if ln < 6 or pos + ln > end:
                break
            body = pos + 6
            if cid in (0x4D4D, 0x3D3D):            # main / editor
                walk(body, pos + ln)
            elif cid == 0x4000:                    # named object
                name, p2 = read_cstr(body)
                walk(p2, pos + ln, objname=name)
            elif cid == 0x4100 and objname is not None:  # triangle mesh
                sub = walk(body, pos + ln, objname=objname)
                if sub and sub["verts"]:
                    meshes.append((objname, sub["verts"], sub["faces"]))
                    emitted = True
            elif cid == 0x4110:                    # vertex list
                (n,) = struct.unpack_from("<H", data, body)
                cur["verts"] = [
                    struct.unpack_from("<fff", data, body + 2 + 12 * i)
                    for i in range(n)]
            elif cid == 0x4120:                    # face list
                (n,) = struct.unpack_from("<H", data, body)
                cur["faces"] = [
                    struct.unpack_from("<HHH", data, body + 2 + 8 * i)
                    for i in range(n)]
            elif cid == 0x4600:                    # light
                lights.append(struct.unpack_from("<fff", data, body))
            pos += ln
        return None if emitted else cur

    walk(0, len(data))
    return meshes, lights


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output", nargs="?")
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()
    data = open(args.input, "rb").read()
    if len(data) < 6 or struct.unpack_from("<H", data)[0] != 0x4D4D:
        sys.exit(f"{args.input}: not a 3DS file (missing 0x4D4D magic)")
    meshes, lights = parse_3ds(data)
    out = open(args.output, "w") if args.output else sys.stdout
    s = args.scale
    for x, y, z in lights:
        out.write(f'LightSource "point" "point from" '
                  f'[{x * s:.6g} {y * s:.6g} {z * s:.6g}] '
                  f'"color I" [50 50 50]\n')
    for name, verts, faces in meshes:
        pts = " ".join(f"{c * s:.6g}" for v in verts for c in v)
        ids = " ".join(str(i) for f in faces for i in f)
        out.write(f'# 3DS object "{name}": {len(verts)} verts, '
                  f'{len(faces)} faces\n')
        out.write(f'Shape "trianglemesh" "integer indices" [{ids}]\n'
                  f'  "point P" [{pts}]\n')
    if args.output:
        out.close()
        print(f"{args.input}: {len(meshes)} meshes, {len(lights)} lights "
              f"-> {args.output}")


if __name__ == "__main__":
    main()
