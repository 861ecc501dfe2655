"""Per-stage timing of the full-frame pipeline on the live backend.

Times jitted prefixes of the frame so the 1080p/100k-tri frame cost
decomposes into: shadow pass | vertex+clip+setup | binning | raster
(fused Pallas) | shading+sky+tonemap. Each stage is its own jit, so
cross-stage fusion is lost — the sum slightly exceeds the real frame.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python profile_frame.py
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    width, height = 1920, 1080
    tri_budget = 100_000
    if os.environ.get("BENCH_SMALL"):
        jax.config.update("jax_platforms", "cpu")
        width, height, tri_budget = 320, 240, 5_000
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from renderer_rs_tpu.core.config import ensure_f32_matmuls

    ensure_f32_matmuls()

    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.ops.clip import clip_triangles_near
    from renderer_rs_tpu.ops.raster import gather_triangle_clip, setup_triangles
    from renderer_rs_tpu.ops.raster_binned import bin_triangles
    from renderer_rs_tpu.renderer.passes import (
        ShadingModel,
        _binned_cap,
        _use_pallas,
        forward_frame,
        shadow_map_pass,
        vertex_stage,
    )
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    scene, layout, kwargs, _ = full_scene(width, height, tri_budget=tri_budget)
    pipeline = GraphicsPipelineBuilder().build()
    shading = kwargs["shading"]
    T = layout.num_triangles
    n_raster = 2 * T
    cap = _binned_cap(n_raster, height, width)
    print(f"tris={T} raster_slots={n_raster} cap={cap} dev={jax.devices()[0]}")

    res = {}

    # --- stage A: shadow pass ------------------------------------------------
    shadow_j = jax.jit(lambda s: shadow_map_pass(s, layout, 1024))
    res["shadow_ms"] = timeit(shadow_j, scene)

    # --- stage B: vertex + clip + setup ---------------------------------------
    def geom(s):
        vs = vertex_stage(s, layout)
        tri_clip = gather_triangle_clip(vs.clip, s.tris)
        tri_clip, clip_valid, clip_src, clip_bary = clip_triangles_near(tri_clip)
        setup = setup_triangles(tri_clip, width, height, pipeline, tri_valid=clip_valid)
        return setup, clip_src, clip_bary, vs

    geom_j = jax.jit(geom)
    res["geom_ms"] = timeit(geom_j, scene)

    # --- stage C: + binning ----------------------------------------------------
    def binning(s):
        setup, *_ = geom(s)
        return bin_triangles(setup, height, width, 32, 128, cap)

    res["geom_bin_ms"] = timeit(jax.jit(binning), scene)

    # --- stage D: + raster (fused pallas w/ varyings) --------------------------
    def raster(s):
        setup, clip_src, clip_bary, vs = geom(s)
        if _use_pallas():
            from renderer_rs_tpu.ops.raster_pallas import rasterize_binned_pallas

            packed = [vs.world_pos, vs.world_normal, s.uvs]
            if layout.texture_slots[1]:
                packed.append(vs.world_tangent)
            attr = jnp.concatenate(packed, axis=-1)
            return rasterize_binned_pallas(
                setup, height, width, pipeline,
                varyings=attr[s.tris], vary_src=clip_src, vary_bary=clip_bary,
            )
        from renderer_rs_tpu.ops.raster_binned import rasterize_binned

        return rasterize_binned(setup, height, width, pipeline, cap=cap)

    res["geom_raster_ms"] = timeit(jax.jit(raster), scene)

    # --- stage E: full frame ---------------------------------------------------
    frame_j = jax.jit(
        lambda s: forward_frame(
            s, layout, pipeline, shading, width, height,
            tonemap=kwargs.get("tonemap", "aces"),
            shadow_map_size=kwargs.get("shadow_map_size", 1024),
        )
    )
    res["frame_ms"] = timeit(frame_j, scene)

    res["bin_only_ms"] = round(res["geom_bin_ms"] - res["geom_ms"], 2)
    res["raster_only_ms"] = round(res["geom_raster_ms"] - res["geom_ms"], 2)
    res["shade_rest_ms"] = round(
        res["frame_ms"] - res["geom_raster_ms"] - res["shadow_ms"], 2
    )
    res = {k: round(v, 2) for k, v in res.items()}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
