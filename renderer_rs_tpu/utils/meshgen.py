"""Procedural mesh generation for demo scenes and benchmarks.

The reference's demo assets (textured cube, Suzanne/bunny, the glTF dancer —
BASELINE.json configs) are partly stripped from the snapshot
(.MISSING_LARGE_BLOBS); these generators provide equivalent workloads with
exact vertex/triangle counts for benchmarking (e.g. a subdivided sphere hits
any target triangle count).
"""

from __future__ import annotations

import numpy as np

from renderer_rs_tpu.resources.model import Mesh


def triangle_mesh() -> Mesh:
    """The Hello Triangle (renderer.rs:242-246) as a Mesh with vertex colors;
    positions are already clip-space (identity camera renders it 1:1)."""
    return Mesh(
        positions=np.array(
            [[0.0, -0.5, 0.0], [-0.5, 0.5, 0.0], [0.5, 0.5, 0.0]], np.float32
        ),
        normals=np.tile(np.array([[0, 0, 1]], np.float32), (3, 1)),
        tex_coords=np.zeros((3, 2), np.float32),
        tangents=np.tile(np.array([[1, 0, 0, 1]], np.float32), (3, 1)),
        indices=np.array([0, 1, 2], np.uint32),
        colors=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32),
    )


def cube_mesh(size: float = 1.0) -> Mesh:
    """Unit cube, 24 vertices (4 per face, correct per-face normals/UVs),
    CCW-front winding for the Vulkan facing rule."""
    s = size * 0.5
    faces = [
        # (normal, u_axis, v_axis)
        ((0, 0, 1), (1, 0, 0), (0, 1, 0)),    # +Z
        ((0, 0, -1), (-1, 0, 0), (0, 1, 0)),  # -Z
        ((1, 0, 0), (0, 0, -1), (0, 1, 0)),   # +X
        ((-1, 0, 0), (0, 0, 1), (0, 1, 0)),   # -X
        ((0, 1, 0), (1, 0, 0), (0, 0, -1)),   # +Y
        ((0, -1, 0), (1, 0, 0), (0, 0, 1)),   # -Y
    ]
    positions, normals, uvs, tangents, indices = [], [], [], [], []
    for f, (n, u, v) in enumerate(faces):
        n = np.array(n, np.float32)
        u = np.array(u, np.float32)
        v = np.array(v, np.float32)
        base = len(positions)
        for du, dv, uu, vv in ((-1, -1, 0, 1), (1, -1, 1, 1), (1, 1, 1, 0), (-1, 1, 0, 0)):
            positions.append(n * s + u * (du * s) + v * (dv * s))
            normals.append(n)
            uvs.append((uu, vv))
            tangents.append((*u, 1.0))
        indices.extend([base, base + 1, base + 2, base, base + 2, base + 3])
    return Mesh(
        positions=np.asarray(positions, np.float32),
        normals=np.asarray(normals, np.float32),
        tex_coords=np.asarray(uvs, np.float32),
        tangents=np.asarray(tangents, np.float32),
        indices=np.asarray(indices, np.uint32),
    )


def uv_sphere_mesh(
    radius: float = 1.0, rings: int = 16, sectors: int = 32
) -> Mesh:
    """UV sphere; triangle count = 2*rings*sectors (pick rings/sectors to hit
    benchmark triangle budgets, e.g. 100k tris -> rings=224, sectors=224)."""
    ring = np.linspace(0.0, np.pi, rings + 1, dtype=np.float32)
    sector = np.linspace(0.0, 2.0 * np.pi, sectors + 1, dtype=np.float32)
    theta, phi = np.meshgrid(ring, sector, indexing="ij")  # [R+1,S+1]
    x = np.sin(theta) * np.cos(phi)
    y = np.cos(theta)
    z = np.sin(theta) * np.sin(phi)
    n = np.stack([x, y, z], -1).reshape(-1, 3)
    positions = n * radius
    u = phi / (2.0 * np.pi)
    v = theta / np.pi
    uvs = np.stack([u, v], -1).reshape(-1, 2)
    # tangent along +phi
    tx = -np.sin(phi)
    tz = np.cos(phi)
    tangents = np.stack([tx, np.zeros_like(tx), tz, np.ones_like(tx)], -1).reshape(-1, 4)

    idx = []
    cols = sectors + 1
    for r in range(rings):
        for s_ in range(sectors):
            a = r * cols + s_
            b = a + cols
            # CCW for outward faces under the Vulkan facing rule
            idx.extend([a, a + 1, b, a + 1, b + 1, b])
    return Mesh(
        positions=positions.astype(np.float32),
        normals=n.astype(np.float32),
        tex_coords=uvs.astype(np.float32),
        tangents=tangents.astype(np.float32),
        indices=np.asarray(idx, np.uint32),
    )


def plane_mesh(size: float = 10.0, uv_scale: float = 4.0) -> Mesh:
    """Ground plane in XZ, +Y normal."""
    s = size * 0.5
    return Mesh(
        positions=np.array(
            [[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s]], np.float32
        ),
        normals=np.tile(np.array([[0, 1, 0]], np.float32), (4, 1)),
        tex_coords=np.array(
            [[0, 0], [uv_scale, 0], [uv_scale, uv_scale], [0, uv_scale]], np.float32
        ),
        tangents=np.tile(np.array([[1, 0, 0, 1]], np.float32), (4, 1)),
        # winding so +Y side is front (CCW under Vulkan rule, viewed from above)
        indices=np.array([0, 2, 1, 0, 3, 2], np.uint32),
    )


def checkerboard_image(size: int = 256, squares: int = 8) -> np.ndarray:
    """RGBA checker texture."""
    q = size // squares
    y, x = np.mgrid[0:size, 0:size]
    c = (((x // q) + (y // q)) % 2).astype(np.float32)
    rgb = 0.2 + 0.6 * c
    img = np.stack([rgb, rgb, rgb, np.ones_like(rgb)], -1)
    return img.astype(np.float32)
