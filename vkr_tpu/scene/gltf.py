"""From-scratch glTF 2.0 loader -> numpy SoA.

The capability equivalent of the reference's tiny_gltf-based loader
(scene/scene.cpp:330-360): meshes merged into one vertex/index pool,
materials with albedo/metallic-roughness texture indices + alpha-MASK flag,
node hierarchy flattened to per-draw-call transforms. No tiny_gltf — plain
json + numpy buffer slicing. Supports the subset the reference consumes
(POSITION/NORMAL/TEXCOORD_0, scalar indices, TRS or matrix nodes,
pbrMetallicRoughness) and tolerates missing pieces the way the reference
does (gray fallback material, opaque_taa.frag:31-44).
"""

from __future__ import annotations

import base64
import dataclasses
import json
import os
from typing import List

import numpy as np

_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}
_TYPE_COUNTS = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}

WRAP_REPEAT = 0
WRAP_CLAMP = 1
_GL_WRAP = {10497: WRAP_REPEAT, 33071: WRAP_CLAMP, 33648: WRAP_REPEAT}


@dataclasses.dataclass
class Primitive:
    """Mirrors reference scene.hpp:21-26."""

    vertex_offset: int
    index_offset: int
    index_count: int
    material: int


@dataclasses.dataclass
class Material:
    """Mirrors reference scene/scene.cpp:171-181."""

    albedo_tex: int = -1      # texture index or -1
    mr_tex: int = -1
    clip_alpha: bool = False  # alphaMode == MASK
    alpha_cutoff: float = 0.5


@dataclasses.dataclass
class DrawCall:
    mesh: int
    transform: np.ndarray  # (4, 4) world matrix


@dataclasses.dataclass
class GltfScene:
    positions: np.ndarray   # (V, 3) f32
    normals: np.ndarray     # (V, 3) f32
    uvs: np.ndarray         # (V, 2) f32
    indices: np.ndarray     # (I,) u32 (relative to prim vertex_offset)
    meshes: List[List[Primitive]]
    materials: List[Material]
    images: List[np.ndarray]       # decoded RGBA8 (H, W, 4) u8
    texture_image: List[int]       # texture -> image index
    texture_wrap: List[int]        # texture -> WRAP_*
    draw_calls: List[DrawCall]
    nodes: List[dict]              # raw node dicts (for animation later)


def _load_buffers(g: dict, base_dir: str) -> List[bytes]:
    out = []
    for buf in g.get("buffers", []):
        uri = buf.get("uri", "")
        if uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            path = os.path.join(base_dir, uri)
            with open(path, "rb") as f:
                out.append(f.read())
    return out


def _read_accessor(g: dict, buffers: List[bytes], idx: int) -> np.ndarray:
    acc = g["accessors"][idx]
    view = g["bufferViews"][acc["bufferView"]]
    dtype = np.dtype(_COMPONENT_DTYPES[acc["componentType"]])
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride", 0) or dtype.itemsize * ncomp
    raw = buffers[view["buffer"]]
    if stride == dtype.itemsize * ncomp:
        arr = np.frombuffer(
            raw, dtype=dtype, count=count * ncomp, offset=offset
        ).reshape(count, ncomp)
    else:
        arr = np.zeros((count, ncomp), dtype)
        for i in range(count):
            arr[i] = np.frombuffer(
                raw, dtype=dtype, count=ncomp, offset=offset + i * stride
            )
    return arr.copy()


def _decode_image(data: bytes) -> np.ndarray:
    from PIL import Image
    import io

    img = Image.open(io.BytesIO(data)).convert("RGBA")
    return np.asarray(img, np.uint8)


def _node_local(node: dict) -> np.ndarray:
    """TRS or matrix node transform (reference
    tinygltf_load_nodes, scene.cpp:305-328)."""
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m = m @ np.diag(np.asarray(list(node["scale"]) + [1.0], np.float32))
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w), 0],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w), 0],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y), 0],
                [0, 0, 0, 1],
            ],
            np.float32,
        )
        m = r @ m
    if "translation" in node:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def load_gltf(path: str, load_images: bool = True) -> GltfScene:
    base_dir = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        g = json.load(f)
    buffers = _load_buffers(g, base_dir)

    positions: List[np.ndarray] = []
    normals: List[np.ndarray] = []
    uvs: List[np.ndarray] = []
    indices: List[np.ndarray] = []
    meshes: List[List[Primitive]] = []
    v_off = 0
    i_off = 0

    for mesh in g.get("meshes", []):
        prims = []
        for prim in mesh["primitives"]:
            if prim.get("mode", 4) != 4:  # triangles only, like the reference
                continue
            attrs = prim["attributes"]
            pos = _read_accessor(g, buffers, attrs["POSITION"]).astype(np.float32)
            n = pos.shape[0]
            if "NORMAL" in attrs:
                nrm = _read_accessor(g, buffers, attrs["NORMAL"]).astype(np.float32)
            else:
                nrm = np.zeros((n, 3), np.float32)
                nrm[:, 2] = 1.0
            if "TEXCOORD_0" in attrs:
                uv = _read_accessor(g, buffers, attrs["TEXCOORD_0"]).astype(np.float32)
            else:
                uv = np.zeros((n, 2), np.float32)
            if "indices" in prim:
                idx = _read_accessor(g, buffers, prim["indices"])
                idx = idx.reshape(-1).astype(np.uint32)
            else:
                idx = np.arange(n, dtype=np.uint32)
            positions.append(pos)
            normals.append(nrm)
            uvs.append(uv)
            indices.append(idx)
            prims.append(
                Primitive(
                    vertex_offset=v_off,
                    index_offset=i_off,
                    index_count=len(idx),
                    material=prim.get("material", -1),
                )
            )
            v_off += n
            i_off += len(idx)
        meshes.append(prims)

    materials = []
    for mat in g.get("materials", []):
        pbr = mat.get("pbrMetallicRoughness", {})
        materials.append(
            Material(
                albedo_tex=pbr.get("baseColorTexture", {}).get("index", -1),
                mr_tex=pbr.get("metallicRoughnessTexture", {}).get("index", -1),
                clip_alpha=mat.get("alphaMode") == "MASK",
                alpha_cutoff=mat.get("alphaCutoff", 0.5),
            )
        )

    images: List[np.ndarray] = []
    if load_images:
        for img in g.get("images", []):
            if "uri" in img and not img["uri"].startswith("data:"):
                with open(os.path.join(base_dir, img["uri"]), "rb") as f:
                    images.append(_decode_image(f.read()))
            elif "uri" in img:
                images.append(
                    _decode_image(base64.b64decode(img["uri"].split(",", 1)[1]))
                )
            elif "bufferView" in img:
                view = g["bufferViews"][img["bufferView"]]
                off = view.get("byteOffset", 0)
                data = buffers[view["buffer"]][off : off + view["byteLength"]]
                images.append(_decode_image(data))

    texture_image = []
    texture_wrap = []
    samplers = g.get("samplers", [])
    for tex in g.get("textures", []):
        texture_image.append(tex.get("source", -1))
        wrap = WRAP_REPEAT
        if "sampler" in tex and tex["sampler"] < len(samplers):
            wrap = _GL_WRAP.get(
                samplers[tex["sampler"]].get("wrapS", 10497), WRAP_REPEAT
            )
        texture_wrap.append(wrap)

    # Flatten node hierarchy to world-space draw calls (reference
    # tinygltf_load_nodes + update_scene tree walk).
    nodes = g.get("nodes", [])
    draw_calls: List[DrawCall] = []

    def visit(node_id: int, parent: np.ndarray):
        node = nodes[node_id]
        world = parent @ _node_local(node)
        if "mesh" in node:
            draw_calls.append(DrawCall(mesh=node["mesh"], transform=world))
        for child in node.get("children", []):
            visit(child, world)

    scene_id = g.get("scene", 0)
    roots = g.get("scenes", [{}])[scene_id].get("roots", None)
    if roots is None:
        roots = g.get("scenes", [{"nodes": list(range(len(nodes)))}])[
            scene_id
        ].get("nodes", list(range(len(nodes))))
    for r in roots:
        visit(r, np.eye(4, dtype=np.float32))

    def cat(parts, width, dtype):
        if parts:
            return np.concatenate(parts, axis=0).astype(dtype)
        return np.zeros((0, width), dtype)

    return GltfScene(
        positions=cat(positions, 3, np.float32),
        normals=cat(normals, 3, np.float32),
        uvs=cat(uvs, 2, np.float32),
        indices=(
            np.concatenate(indices) if indices else np.zeros(0, np.uint32)
        ),
        meshes=meshes,
        materials=materials,
        images=images,
        texture_image=texture_image,
        texture_wrap=texture_wrap,
        draw_calls=draw_calls,
        nodes=nodes,
    )
