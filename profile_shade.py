"""Micro-profile of the shading-stage components at 1080p on the live
backend: material gather, PBR direct, shadow factor, IBL ambient, skybox,
tonemap — each as its own small jit over framebuffer-shaped inputs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python profile_shade.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / n * 1000.0, 2)


def main():
    width, height = 1920, 1080
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.ops import pbr as pbr_ops
    from renderer_rs_tpu.ops.shadow import ShadowParams, calculate_shadow
    from renderer_rs_tpu.ops.skybox import skybox_pass
    from renderer_rs_tpu.ops.tonemap import apply_tonemap

    scene, layout, kwargs, _ = full_scene(width, height, tri_budget=100_000)
    print("skybox mip0", scene.environment.skybox_mips[0].shape)
    print("irradiance", [m.shape for m in scene.environment.irradiance_mips])
    print("prefiltered", [m.shape for m in scene.environment.prefiltered_mips])

    rng = np.random.default_rng(0)
    normal = jnp.asarray(rng.standard_normal((height, width, 3)), jnp.float32)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    world_pos = jnp.asarray(rng.standard_normal((height, width, 3)) * 3, jnp.float32)
    view_dir = normal
    tid = jnp.asarray(rng.integers(0, layout.num_triangles, (height, width)), jnp.int32)
    depth = jnp.asarray(rng.random((height, width)), jnp.float32)
    color = jnp.asarray(rng.random((height, width, 4)), jnp.float32)
    shadow_map = jnp.asarray(rng.random((1024, 1024)), jnp.float32)

    res = {}

    # material bank gather
    from renderer_rs_tpu.renderer.passes import _material_bank

    bank = _material_bank(scene.materials)
    tri_mat = scene.tri_material

    res["mat_gather_ms"] = timeit(
        jax.jit(lambda t: bank[tri_mat][t]), tid
    )

    # pbr direct (sun only)
    mat = pbr_ops.PBRMaterialParams(
        albedo=color[..., :3], metallic=depth, roughness=depth, ao=depth,
        emissive=color[..., :3],
    )
    sun_dir = jnp.array([0.3, 0.8, 0.5], jnp.float32)

    res["pbr_direct_ms"] = timeit(
        jax.jit(
            lambda n, v: pbr_ops.pbr_direct(
                n, v, jnp.broadcast_to(sun_dir, n.shape), jnp.ones(3), mat
            )
        ),
        normal, view_dir,
    )

    # shadow factor
    lsm = scene.light_space_matrix
    res["shadow_factor_ms"] = timeit(
        jax.jit(
            lambda sm, wp, n: calculate_shadow(
                sm, lsm, wp, n, jnp.broadcast_to(sun_dir, wp.shape), ShadowParams()
            )
        ),
        shadow_map, world_pos, normal,
    )

    # IBL ambient
    env = scene.environment

    def ibl(n, v):
        r = v - 2.0 * jnp.sum(v * n, -1, keepdims=True) * n
        return pbr_ops.calculate_ibl(
            n, v, -r, mat, env.irradiance_mips, env.prefiltered_mips, env.brdf_lut
        )

    res["ibl_ms"] = timeit(jax.jit(ibl), normal, view_dir)

    # skybox
    inv_vp = jnp.linalg.inv(scene.camera.view_projection)
    res["skybox_ms"] = timeit(
        jax.jit(
            lambda c, d: skybox_pass(c, d, inv_vp, env.skybox_mips[0])
        ),
        color, depth,
    )

    # tonemap
    res["tonemap_ms"] = timeit(jax.jit(lambda c: apply_tonemap(c, "aces")), color)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
