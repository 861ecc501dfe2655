"""Micro-profile of the CURRENT shading-stage components at 1080p on the
live backend (fast-ambient path): PBR direct, PCF shadow factor, SH9+atlas
ambient (the two merged specular/skybox gathers), tonemap, and the
tile-major -> row-major varying stitch.

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
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.ops import pbr as pbr_ops
    from renderer_rs_tpu.ops.sampling import _cube_atlas_fetch, direction_to_cube_uv
    from renderer_rs_tpu.ops.shadow import ShadowParams, calculate_shadow
    from renderer_rs_tpu.ops.tonemap import apply_tonemap

    scene, layout, kwargs, _ = full_scene(width, height, tri_budget=100_000)
    env = scene.environment
    print("atlas", env.atlas.shape, "sh", env.irradiance_sh.shape)

    rng = np.random.default_rng(0)
    normal = jnp.asarray(rng.standard_normal((height, width, 3)), jnp.float32)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    world_pos = jnp.asarray(rng.standard_normal((height, width, 3)) * 3, jnp.float32)
    view_dir = normal
    depth = jnp.asarray(rng.random((height, width)), jnp.float32)
    color = jnp.asarray(rng.random((height, width, 4)), jnp.float32)
    shadow_map = jnp.asarray(rng.random((1024, 1024)), jnp.float32)

    res = {}
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

    lsm = scene.light_space_matrix
    res["shadow_factor_ms"] = timeit(
        jax.jit(
            lambda sm, wp, n: calculate_shadow(
                sm, lsm, wp, n, jnp.broadcast_to(sun_dir, wp.shape), ShadowParams()
            )
        ),
        shadow_map, world_pos, normal,
    )

    # fast ambient WITHOUT the atlas gathers (SH9 + analytic env BRDF)
    spec_sky = color[..., :3]
    res["ambient_sh_math_ms"] = timeit(
        jax.jit(
            lambda n, v, s: pbr_ops.calculate_ibl_fast(
                n, v, mat, env.irradiance_sh, s
            )
        ),
        normal, view_dir, spec_sky,
    )

    # the two merged specular/skybox atlas gathers
    n_pref = len(env.prefiltered_mips)
    max_lod = float(n_pref - 1)

    def atlas_fetch(n, v, d):
        r = v - 2.0 * jnp.sum(v * n, -1, keepdims=True) * n
        r = -r
        far = d >= 1.0
        dirs = jnp.where(far[..., None], v, r)
        lod = jnp.where(far, float(n_pref), depth * max_lod)
        face, uv = direction_to_cube_uv(dirs)
        lo_l = jnp.floor(lod).astype(jnp.int32)
        hi_l = jnp.where(far, n_pref, jnp.minimum(lo_l + 1, n_pref - 1))
        frac = (lod - lo_l.astype(lod.dtype))[..., None]
        c = env.skybox_mips[0].shape[-1]
        f_lo = _cube_atlas_fetch(env.atlas, env.atlas_offsets, env.atlas_sizes, lo_l, face, uv, c)
        f_hi = _cube_atlas_fetch(env.atlas, env.atlas_offsets, env.atlas_sizes, hi_l, face, uv, c)
        return (f_lo * (1.0 - frac) + f_hi * frac)[..., :3]

    res["atlas_2gather_ms"] = timeit(jax.jit(atlas_fetch), normal, view_dir, depth)

    res["tonemap_ms"] = timeit(jax.jit(lambda c: apply_tonemap(c, "aces")), color)

    # tile-major [n_tiles, K, th, tw] -> [H, W, K] varying stitch
    k = 19
    nty, ntx, th, tw = 34, 15, 32, 128
    tiles = jnp.asarray(
        rng.standard_normal((nty * ntx, k, th, tw)), jnp.float32
    )

    def stitch(vt):
        full = vt.reshape(nty, ntx, k, th, tw)
        full = full.transpose(2, 0, 3, 1, 4).reshape(k, nty * th, ntx * tw)
        return full[:, :height, :width].transpose(1, 2, 0)

    res["vary_stitch_ms"] = timeit(jax.jit(stitch), tiles)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
