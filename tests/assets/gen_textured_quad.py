"""Generate tests/assets/textured_quad.glb — a deterministic 2-triangle quad
with a 16x16 PNG base-color texture (left half red, right half blue, one
green corner block) and a TANGENT-less primitive, used by the texture and
tangent-generation integration tests.

Run: python tests/assets/gen_textured_quad.py
"""

import io
import json
import os
import struct

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))


def png_bytes() -> bytes:
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :8] = (220, 40, 30)  # left: red
    img[:, 8:] = (30, 60, 220)  # right: blue
    img[:4, :4] = (30, 200, 60)  # top-left corner: green
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def build() -> bytes:
    pos = np.array(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    # CCW seen from +Y (the normal direction): 0,2,1 / 0,3,2
    idx = np.array([0, 2, 1, 0, 3, 2], np.uint16)
    png = png_bytes()

    blobs = [pos.tobytes(), nrm.tobytes(), uv.tobytes(), idx.tobytes(), png]
    offsets, bin_data = [], b""
    for b in blobs:
        offsets.append(len(bin_data))
        bin_data += b + b"\x00" * (-len(b) % 4)

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 0},
                    "metallicFactor": 0.0,
                    "roughnessFactor": 1.0,
                }
            }
        ],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 4, "mimeType": "image/png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
             "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": len(blobs[0])},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": len(blobs[1])},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": len(blobs[2])},
            {"buffer": 0, "byteOffset": offsets[3], "byteLength": len(blobs[3])},
            {"buffer": 0, "byteOffset": offsets[4], "byteLength": len(blobs[4])},
        ],
        "buffers": [{"byteLength": len(bin_data)}],
    }

    js = json.dumps(doc, separators=(",", ":")).encode()
    js += b" " * (-len(js) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_data)
    glb = struct.pack("<III", 0x46546C67, 2, total)
    glb += struct.pack("<II", len(js), 0x4E4F534A) + js
    glb += struct.pack("<II", len(bin_data), 0x004E4942) + bin_data
    return glb


if __name__ == "__main__":
    out = os.path.join(HERE, "textured_quad.glb")
    with open(out, "wb") as f:
        f.write(build())
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")
