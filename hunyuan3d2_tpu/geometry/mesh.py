"""Triangle-mesh container + OBJ/PLY/GLB io, written from scratch.

The reference leans on ``trimesh`` for mesh objects and export
(hy3dgen/shapegen/pipelines.py:95-110 export_to_trimesh,
texgen mesh_render.py:228-231 save_mesh). This environment has no trimesh, so
the framework ships its own minimal, dependency-free mesh type with:

  * vertices [N,3] float32, faces [M,3] int32 (CCW winding),
  * optional per-vertex uv [N,2], normals [N,3], vertex colors [N,3/4],
  * optional texture image (H,W,3|4 uint8) bound through uv,
  * exporters: .obj (+.mtl+png), .ply (binary little-endian), .glb (glTF 2.0
    with POSITION/NORMAL/TEXCOORD_0 + baseColorTexture),
  * loaders: .obj, .ply (binary+ascii), .glb — enough to round-trip our own
    exports and ingest common assets for texturing.
"""

from __future__ import annotations

import io as _io
import json
import struct
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class Mesh:
    vertices: np.ndarray                 # [N, 3] float32
    faces: np.ndarray                    # [M, 3] int32
    uv: Optional[np.ndarray] = None      # [N, 2] float32 in [0,1]
    normals: Optional[np.ndarray] = None # [N, 3] float32
    vertex_colors: Optional[np.ndarray] = None  # [N, 3|4] float32 or uint8
    texture: Optional[np.ndarray] = None # [H, W, 3|4] uint8
    metadata: dict = field(default_factory=dict)

    def __post_init__(self):
        self.vertices = np.ascontiguousarray(self.vertices, dtype=np.float32)
        self.faces = np.ascontiguousarray(self.faces, dtype=np.int32)

    # -- basic ops -----------------------------------------------------------
    def copy(self) -> "Mesh":
        return Mesh(
            self.vertices.copy(), self.faces.copy(),
            None if self.uv is None else self.uv.copy(),
            None if self.normals is None else self.normals.copy(),
            None if self.vertex_colors is None else self.vertex_colors.copy(),
            None if self.texture is None else self.texture.copy(),
            dict(self.metadata),
        )

    @property
    def bounds(self) -> np.ndarray:
        return np.stack([self.vertices.min(0), self.vertices.max(0)])

    def face_normals(self) -> np.ndarray:
        v = self.vertices
        f = self.faces
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        lens = np.linalg.norm(n, axis=1, keepdims=True)
        return n / np.maximum(lens, 1e-12)

    def compute_vertex_normals(self) -> np.ndarray:
        """Area-weighted vertex normals."""
        v, f = self.vertices, self.faces
        fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        vn = np.zeros_like(v)
        for i in range(3):
            np.add.at(vn, f[:, i], fn)
        lens = np.linalg.norm(vn, axis=1, keepdims=True)
        self.normals = vn / np.maximum(lens, 1e-12)
        return self.normals

    def flip_winding(self) -> "Mesh":
        """Reverse triangle orientation (parity: the face-winding flip at
        reference pipelines.py:103, export_to_trimesh)."""
        self.faces = self.faces[:, ::-1].copy()
        return self

    def remove_unreferenced_vertices(self) -> "Mesh":
        used = np.zeros(len(self.vertices), dtype=bool)
        used[self.faces.reshape(-1)] = True
        remap = np.cumsum(used) - 1
        self.vertices = self.vertices[used]
        if self.uv is not None:
            self.uv = self.uv[used]
        if self.normals is not None:
            self.normals = self.normals[used]
        if self.vertex_colors is not None:
            self.vertex_colors = self.vertex_colors[used]
        self.faces = remap[self.faces].astype(np.int32)
        return self

    # -- export ---------------------------------------------------------------
    def export(self, path: str):
        p = str(path).lower()
        if p.endswith(".obj"):
            self._export_obj(path)
        elif p.endswith(".ply"):
            self._export_ply(path)
        elif p.endswith(".glb"):
            self._export_glb(path)
        elif p.endswith(".stl"):
            self._export_stl(path)
        else:
            raise ValueError(f"unsupported mesh format: {path}")
        return path

    def _export_stl(self, path: str):
        """Binary STL (84-byte header + 50 bytes/triangle; geometry only)."""
        import struct

        v = np.asarray(self.vertices, np.float32)
        f = np.asarray(self.faces, np.int64)
        tri = v[f]                                       # [F, 3, 3]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        with open(path, "wb") as fh:
            fh.write(b"hy3d binary stl".ljust(80, b"\0"))
            fh.write(struct.pack("<I", len(f)))
            payload = np.empty((len(f),), dtype=[("n", "<3f4"), ("v", "<9f4"),
                                                 ("attr", "<u2")])
            payload["n"] = n.astype("<f4")
            payload["v"] = tri.reshape(len(f), 9).astype("<f4")
            payload["attr"] = 0
            fh.write(payload.tobytes())

    def _export_obj(self, path: str):
        lines = []
        tex_name = None
        if self.texture is not None and self.uv is not None:
            import os

            base = path[: path.rfind(".")]
            tex_name = os.path.basename(base) + ".png"
            _write_png(base + ".png", self.texture)
            mtl = base + ".mtl"
            with open(mtl, "w") as fh:
                fh.write("newmtl material_0\nKd 1 1 1\nmap_Kd %s\n" % tex_name)
            lines.append("mtllib %s" % os.path.basename(mtl))
            lines.append("usemtl material_0")
        for v in self.vertices:
            lines.append("v %.6f %.6f %.6f" % tuple(v))
        if self.uv is not None:
            for t in self.uv:
                lines.append("vt %.6f %.6f" % tuple(t))
        if self.normals is not None:
            for n in self.normals:
                lines.append("vn %.6f %.6f %.6f" % tuple(n))
        f1 = self.faces + 1
        if self.uv is not None and self.normals is not None:
            fmt = "f %d/%d/%d %d/%d/%d %d/%d/%d"
            for a, b, c in f1:
                lines.append(fmt % (a, a, a, b, b, b, c, c, c))
        elif self.uv is not None:
            for a, b, c in f1:
                lines.append("f %d/%d %d/%d %d/%d" % (a, a, b, b, c, c))
        else:
            for a, b, c in f1:
                lines.append("f %d %d %d" % (a, b, c))
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n")

    def _export_ply(self, path: str):
        n, m = len(self.vertices), len(self.faces)
        has_color = self.vertex_colors is not None
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if has_color:
            header += ["property uchar red", "property uchar green", "property uchar blue"]
        header += [f"element face {m}", "property list uchar int vertex_indices", "end_header"]
        with open(path, "wb") as fh:
            fh.write(("\n".join(header) + "\n").encode())
            if has_color:
                col = self.vertex_colors
                if col.dtype != np.uint8:
                    col = (np.clip(col, 0, 1) * 255).astype(np.uint8)
                rec = np.zeros(n, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
                rec["xyz"] = self.vertices
                rec["rgb"] = col[:, :3]
                fh.write(rec.tobytes())
            else:
                fh.write(self.vertices.astype("<f4").tobytes())
            frec = np.zeros(m, dtype=[("cnt", np.uint8), ("idx", "<i4", 3)])
            frec["cnt"] = 3
            frec["idx"] = self.faces
            fh.write(frec.tobytes())

    def _export_glb(self, path: str):
        with open(path, "wb") as fh:
            fh.write(self.to_glb_bytes())

    def to_glb_bytes(self) -> bytes:
        """Serialize as a single-buffer binary glTF 2.0 asset."""
        v = self.vertices.astype("<f4")
        idx = self.faces.astype("<u4").reshape(-1)
        blobs, views, accessors = [], [], []
        offset = 0

        def add_blob(data: bytes, target: Optional[int]) -> int:
            nonlocal offset
            pad = (-len(data)) % 4
            blobs.append(data + b"\x00" * pad)
            views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(data),
                          **({"target": target} if target else {})})
            offset += len(data) + pad
            return len(views) - 1

        # indices
        bv = add_blob(idx.tobytes(), 34963)
        accessors.append({"bufferView": bv, "componentType": 5125, "count": int(idx.size),
                          "type": "SCALAR", "max": [int(idx.max()) if idx.size else 0],
                          "min": [int(idx.min()) if idx.size else 0]})
        acc_idx = 0
        # positions
        bv = add_blob(v.tobytes(), 34962)
        accessors.append({"bufferView": bv, "componentType": 5126, "count": int(len(v)),
                          "type": "VEC3", "max": v.max(0).tolist() if len(v) else [0, 0, 0],
                          "min": v.min(0).tolist() if len(v) else [0, 0, 0]})
        attributes = {"POSITION": 1}
        acc = 2
        if self.normals is not None:
            nrm = self.normals.astype("<f4")
            bv = add_blob(nrm.tobytes(), 34962)
            accessors.append({"bufferView": bv, "componentType": 5126,
                              "count": int(len(nrm)), "type": "VEC3"})
            attributes["NORMAL"] = acc
            acc += 1
        if self.uv is not None:
            # glTF uv origin is top-left; ours (OBJ convention) bottom-left.
            uv = self.uv.astype("<f4").copy()
            uv[:, 1] = 1.0 - uv[:, 1]
            bv = add_blob(uv.tobytes(), 34962)
            accessors.append({"bufferView": bv, "componentType": 5126,
                              "count": int(len(uv)), "type": "VEC2"})
            attributes["TEXCOORD_0"] = acc
            acc += 1
        if self.vertex_colors is not None:
            col = self.vertex_colors
            if col.dtype == np.uint8:
                col = col.astype(np.float32) / 255.0
            if col.shape[1] == 3:
                col = np.concatenate([col, np.ones((len(col), 1), np.float32)], 1)
            bv = add_blob(col.astype("<f4").tobytes(), 34962)
            accessors.append({"bufferView": bv, "componentType": 5126,
                              "count": int(len(col)), "type": "VEC4"})
            attributes["COLOR_0"] = acc
            acc += 1

        gltf = {
            "asset": {"version": "2.0", "generator": "hunyuan3d2_tpu"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{"attributes": attributes, "indices": acc_idx,
                                        "mode": 4}]}],
            "accessors": accessors,
        }
        if self.metadata:
            gltf["extras"] = _jsonable(self.metadata)
        if self.texture is not None and self.uv is not None:
            png = _png_bytes(self.texture)
            bv = add_blob(png, None)
            gltf["images"] = [{"bufferView": bv, "mimeType": "image/png"}]
            gltf["samplers"] = [{"magFilter": 9729, "minFilter": 9987,
                                 "wrapS": 10497, "wrapT": 10497}]
            gltf["textures"] = [{"sampler": 0, "source": 0}]
            gltf["materials"] = [{
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 0},
                    "metallicFactor": 0.0, "roughnessFactor": 1.0,
                }}]
            gltf["meshes"][0]["primitives"][0]["material"] = 0
        gltf["bufferViews"] = views
        bin_chunk = b"".join(blobs)
        gltf["buffers"] = [{"byteLength": len(bin_chunk)}]

        js = json.dumps(gltf, separators=(",", ":")).encode()
        js += b" " * ((-len(js)) % 4)
        total = 12 + 8 + len(js) + 8 + len(bin_chunk)
        out = b"glTF" + struct.pack("<II", 2, total)
        out += struct.pack("<I", len(js)) + b"JSON" + js
        out += struct.pack("<I", len(bin_chunk)) + b"BIN\x00" + bin_chunk
        return out

    # -- load ------------------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "Mesh":
        p = str(path).lower()
        if p.endswith(".obj"):
            return _load_obj(path)
        if p.endswith(".ply"):
            return _load_ply(path)
        if p.endswith(".glb"):
            return _load_glb(path)
        raise ValueError(f"unsupported mesh format: {path}")


def _jsonable(x):
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    if isinstance(x, np.ndarray):
        return x.tolist()
    return x


# ---------------------------------------------------------------------------
# PNG codec via PIL (available in env); zlib fallback writer kept minimal.
# ---------------------------------------------------------------------------
def _png_bytes(img: np.ndarray) -> bytes:
    """PNG-encode with a compressibility-adaptive zlib level.

    High-frequency textures are incompressible (a 2048² noise atlas is
    12.59 MB at level 1 AND level 6) but level 6 costs ~3.3 s of single-core
    deflate vs ~0.9 s at level 1 — pure waste on this host. A 64-row sample
    at level 1 decides: if it barely compresses, encode fast; smooth/real
    textures keep the default level for the smaller file."""
    import zlib

    from PIL import Image

    level = -1  # PIL default (zlib 6)
    if img.ndim == 3 and img.shape[0] >= 256:
        sample = np.ascontiguousarray(img[:: img.shape[0] // 64][:64])
        if len(zlib.compress(sample.tobytes(), 1)) > 0.8 * sample.nbytes:
            level = 1
    buf = _io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG",
                              compress_level=level if level > 0 else 6)
    return buf.getvalue()


def _write_png(path: str, img: np.ndarray):
    with open(path, "wb") as fh:
        fh.write(_png_bytes(img))


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------
def _load_obj(path: str) -> Mesh:
    vs, vts, vns, faces, face_uv_idx = [], [], [], [], []
    with open(path) as fh:
        for line in fh:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                vs.append([float(x) for x in t[1:4]])
            elif t[0] == "vt":
                vts.append([float(x) for x in t[1:3]])
            elif t[0] == "vn":
                vns.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                idx = [p.split("/") for p in t[1:]]
                # triangulate fans
                for i in range(1, len(idx) - 1):
                    tri = [idx[0], idx[i], idx[i + 1]]
                    faces.append([int(p[0]) - 1 for p in tri])
                    if len(tri[0]) > 1 and tri[0][1]:
                        face_uv_idx.append([int(p[1]) - 1 for p in tri])
    v = np.array(vs, np.float32)
    f = np.array(faces, np.int32)
    uv = None
    if face_uv_idx and vts:
        vt = np.array(vts, np.float32)
        uvi = np.array(face_uv_idx, np.int32)
        # if uv indexing disagrees with vertex indexing, split vertices
        uv = np.zeros((len(v), 2), np.float32)
        conflict = np.zeros(len(v), dtype=bool)
        seen = np.full(len(v), -1, np.int64)
        flat_v = f.reshape(-1)
        flat_t = uvi.reshape(-1)
        first = seen[flat_v] == -1
        seen[flat_v[first]] = flat_t[first]
        conflict_mask = seen[flat_v] != flat_t
        if conflict_mask.any():
            # rebuild with per-corner vertices (simple and correct)
            nv = v[flat_v]
            uv = vt[flat_t]
            f = np.arange(len(flat_v), dtype=np.int32).reshape(-1, 3)
            return Mesh(nv, f, uv=uv)
        uv[flat_v] = vt[flat_t]
        del conflict
    m = Mesh(v, f, uv=uv)
    if vns and len(vns) == len(vs):
        m.normals = np.array(vns, np.float32)
    return m


def _load_ply(path: str) -> Mesh:
    with open(path, "rb") as fh:
        data = fh.read()
    header_end = data.find(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii", "replace").splitlines()
    fmt = "binary_little_endian"
    n_vert = n_face = 0
    vert_props = []
    cur = None
    for line in header:
        t = line.split()
        if not t:
            continue
        if t[0] == "format":
            fmt = t[1]
        elif t[0] == "element":
            cur = t[1]
            if t[1] == "vertex":
                n_vert = int(t[2])
            elif t[1] == "face":
                n_face = int(t[2])
        elif t[0] == "property" and cur == "vertex" and t[1] != "list":
            vert_props.append((t[2], t[1]))
    type_map = {"float": "<f4", "float32": "<f4", "double": "<f8",
                "uchar": "u1", "uint8": "u1", "int": "<i4", "uint": "<u4",
                "short": "<i2", "ushort": "<u2", "char": "i1"}
    if fmt.startswith("binary"):
        dt = np.dtype([(n, type_map[t]) for n, t in vert_props])
        body = data[header_end:]
        verts = np.frombuffer(body, dt, count=n_vert)
        v = np.stack([verts["x"], verts["y"], verts["z"]], 1).astype(np.float32)
        colors = None
        if "red" in verts.dtype.names:
            colors = np.stack([verts["red"], verts["green"], verts["blue"]], 1)
        off = n_vert * dt.itemsize
        fdt = np.dtype([("cnt", "u1"), ("idx", "<i4", 3)])
        faces = np.frombuffer(body, fdt, count=n_face, offset=off)["idx"].astype(np.int32)
        return Mesh(v, faces, vertex_colors=colors)
    # ascii
    lines = data[header_end:].decode().splitlines()
    v = np.array([[float(x) for x in ln.split()[:3]] for ln in lines[:n_vert]], np.float32)
    faces = np.array([[int(x) for x in ln.split()[1:4]] for ln in lines[n_vert:n_vert + n_face]], np.int32)
    return Mesh(v, faces)


def _load_glb(path: str) -> Mesh:
    with open(path, "rb") as fh:
        magic, version, _total = struct.unpack("<4sII", fh.read(12))
        assert magic == b"glTF", "not a GLB file"
        json_blob = bin_blob = None
        while True:
            hdr = fh.read(8)
            if len(hdr) < 8:
                break
            ln, typ = struct.unpack("<I4s", hdr)
            chunk = fh.read(ln)
            if typ == b"JSON":
                json_blob = chunk
            elif typ == b"BIN\x00":
                bin_blob = chunk
    g = json.loads(json_blob)

    def read_accessor(i):
        a = g["accessors"][i]
        bv = g["bufferViews"][a["bufferView"]]
        comp = {5120: "i1", 5121: "u1", 5122: "<i2", 5123: "<u2",
                5125: "<u4", 5126: "<f4"}[a["componentType"]]
        n_comp = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}[a["type"]]
        off = bv.get("byteOffset", 0) + a.get("byteOffset", 0)
        arr = np.frombuffer(bin_blob, comp, count=a["count"] * n_comp, offset=off)
        return arr.reshape(a["count"], n_comp) if n_comp > 1 else arr

    prim = g["meshes"][0]["primitives"][0]
    v = read_accessor(prim["attributes"]["POSITION"]).astype(np.float32)
    faces = read_accessor(prim["indices"]).astype(np.int32).reshape(-1, 3)
    m = Mesh(v, faces)
    if "TEXCOORD_0" in prim["attributes"]:
        uv = read_accessor(prim["attributes"]["TEXCOORD_0"]).astype(np.float32).copy()
        uv[:, 1] = 1.0 - uv[:, 1]
        m.uv = uv
    if "NORMAL" in prim["attributes"]:
        m.normals = read_accessor(prim["attributes"]["NORMAL"]).astype(np.float32)
    if "images" in g and g["images"]:
        img = g["images"][0]
        if "bufferView" in img:
            bv = g["bufferViews"][img["bufferView"]]
            off = bv.get("byteOffset", 0)
            png = bin_blob[off: off + bv["byteLength"]]
            from PIL import Image

            m.texture = np.asarray(Image.open(_io.BytesIO(png)).convert("RGB"))
    return m
