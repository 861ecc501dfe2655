"""Fresh stage decomposition at current HEAD (textured 1080p scene)."""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/probes")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from scene_cache_tex import get_full_scene_tex
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

W, H = 1920, 1080
scene, layout, kwargs = get_full_scene_tex()
pipe = GraphicsPipelineBuilder().build()
FRAMES = int(os.environ.get("AB_FRAMES", "16"))


def bench(make):
    @jax.jit
    def f(eps):
        s = scene.replace(positions=scene.positions + eps)
        return make(s)

    out = f(jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = f(jnp.float32((i + 1) * 1e-12))
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / FRAMES * 1000.0, 2)


from renderer_rs_tpu.ops.clip import clip_triangles_near
from renderer_rs_tpu.ops.raster import gather_triangle_clip, setup_triangles
from renderer_rs_tpu.ops.raster_binned import bin_triangles_compact
from renderer_rs_tpu.renderer.passes import (
    forward_frame, shadow_map_pass, vertex_stage,
)
from renderer_rs_tpu.ops.raster_pallas import rasterize_binned_pallas

T = layout.num_triangles
res = {}
which = sys.argv[1:] or ["all"]
want = lambda k: "all" in which or k in which


def geom(s):
    vs = vertex_stage(s, layout)
    tri_clip = gather_triangle_clip(vs.clip, s.tris)
    tri_clip, clip_valid, clip_src, clip_bary = clip_triangles_near(tri_clip)
    setup = setup_triangles(tri_clip, W, H, pipe, tri_valid=clip_valid)
    return vs, setup, clip_src, clip_bary


if want("frame"):
    def f(s):
        return forward_frame(
            s, layout, pipe, kwargs["shading"], W, H,
            tonemap=kwargs.get("tonemap", "aces"),
            shadow_map_size=kwargs.get("shadow_map_size", 1024),
            shadow_params=kwargs.get("shadow_params"),
        )
    res["frame"] = bench(f)
    print("frame", res["frame"], flush=True)

if want("shadow"):
    res["shadow"] = bench(
        lambda s: shadow_map_pass(s, layout, kwargs.get("shadow_map_size", 1024)).sum()
    )
    print("shadow", res["shadow"], flush=True)

if want("geom"):
    res["geom"] = bench(lambda s: geom(s)[1].z.sum())
    print("geom", res["geom"], flush=True)

if want("vstage"):
    # vertex stage alone: ~4 ops x n_objects of small-matmul dispatches —
    # if this dominates `geom`, batch the per-object loop
    def f(s):
        vs = vertex_stage(s, layout)
        return vs.clip.sum() + vs.world_normal.sum() + vs.world_tangent.sum()
    res["vstage"] = bench(f)
    print("vstage", res["vstage"], flush=True)

if want("clip"):
    # geom minus setup: vertex stage + triangle gather + near clip
    def f(s):
        vs = vertex_stage(s, layout)
        tri_clip = gather_triangle_clip(vs.clip, s.tris)
        tri_clip, clip_valid, _, cb = clip_triangles_near(tri_clip)
        return tri_clip.sum() + cb.sum()
    res["clip"] = bench(f)
    print("clip", res["clip"], flush=True)

if want("bin"):
    def f(s):
        _, setup, _, _ = geom(s)
        st, seg, nby, nbx, ov = bin_triangles_compact(
            setup, H, W, 16, 128, small_limit=T
        )
        return st.sum() + seg.sum()
    res["bin"] = bench(f)
    print("bin", res["bin"], flush=True)

if want("vis"):
    def f(s):
        _, setup, clip_src, _ = geom(s)
        vis = rasterize_binned_pallas(
            setup, H, W, pipe, ids=clip_src, small_limit=T
        )
        return vis.depth.sum() + vis.tri_id.sum()
    res["vis"] = bench(f)
    print("vis", res["vis"], flush=True)

if want("defer"):
    # the pre-2026-08-19 AoS defer build (kept to track the compiler
    # regression that pessimized the [t,3,K] column stack: 26.9 -> 97.8)
    def f(s):
        vs, setup, clip_src, clip_bary = geom(s)
        packed = [vs.world_pos, vs.world_normal, s.uvs, vs.world_tangent]
        attr = jnp.concatenate(packed, axis=-1)
        mat_flat = s.tri_material[:, None].astype(jnp.float32)
        vis, vary = rasterize_binned_pallas(
            setup, H, W, pipe,
            varyings=attr[s.tris], vary_src=clip_src, vary_bary=clip_bary,
            flat_varyings=mat_flat, skip_bary=True, small_limit=T,
            defer_varyings=True,
        )
        return vis.depth.sum() + vary.sum()
    res["defer"] = bench(f)
    print("defer", res["defer"], flush=True)

if want("defer_soa"):
    # the live fused path (SoA default since 2026-08-19): plane-form clip
    # frame + [V,K] attrs; no [t,3,K] intermediate, no column stack
    from renderer_rs_tpu.ops.clip import (
        bary_planes_to_array, clip_triangles_near_planes,
    )

    def f(s):
        vs = vertex_stage(s, layout)
        tri_clip = gather_triangle_clip(vs.clip, s.tris)
        tri_clip, clip_valid, clip_src, cbp = clip_triangles_near_planes(
            tri_clip
        )
        setup = setup_triangles(tri_clip, W, H, pipe, tri_valid=clip_valid)
        packed = [vs.world_pos, vs.world_normal, s.uvs, vs.world_tangent]
        attr = jnp.concatenate(packed, axis=-1)
        mat_flat = s.tri_material[:, None].astype(jnp.float32)
        vis, vary = rasterize_binned_pallas(
            setup, H, W, pipe,
            varyings=None, varyings_soa=(attr, s.tris),
            vary_src=clip_src, vary_bary_planes=cbp,
            flat_varyings=mat_flat, skip_bary=True, small_limit=T,
            defer_varyings=True,
        )
        return vis.depth.sum() + vary.sum()
    res["defer_soa"] = bench(f)
    print("defer_soa", res["defer_soa"], flush=True)

if want("defer_kernel"):
    # in-kernel winner-row dynamic_gather resolve (RENDERER_DEFER_VARY=
    # kernel): same products as defer_soa, resolve inside the kernel
    from renderer_rs_tpu.ops.clip import clip_triangles_near_planes

    def f(s):
        vs = vertex_stage(s, layout)
        tri_clip = gather_triangle_clip(vs.clip, s.tris)
        tri_clip, clip_valid, clip_src, cbp = clip_triangles_near_planes(
            tri_clip
        )
        setup = setup_triangles(tri_clip, W, H, pipe, tri_valid=clip_valid)
        packed = [vs.world_pos, vs.world_normal, s.uvs, vs.world_tangent]
        attr = jnp.concatenate(packed, axis=-1)
        mat_flat = s.tri_material[:, None].astype(jnp.float32)
        vis, vary = rasterize_binned_pallas(
            setup, H, W, pipe,
            varyings=None, varyings_soa=(attr, s.tris),
            vary_src=clip_src, vary_bary_planes=cbp,
            flat_varyings=mat_flat, skip_bary=True, small_limit=T,
            defer_varyings="kernel", chunk=128,
        )
        return vis.depth.sum() + vary.sum()
    res["defer_kernel"] = bench(f)
    print("defer_kernel", res["defer_kernel"], flush=True)

if want("defer_kernel64") or want("defer_kernel32") or want("defer_soa128"):
    # chunk-size attribution: is defer_kernel's in-kernel cost the gathers
    # or the chunk=128 main-loop regression?
    from renderer_rs_tpu.ops.clip import clip_triangles_near_planes

    def mk(defer, chunk):
        def f(s):
            vs = vertex_stage(s, layout)
            tri_clip = gather_triangle_clip(vs.clip, s.tris)
            tri_clip, clip_valid, clip_src, cbp = clip_triangles_near_planes(
                tri_clip
            )
            setup = setup_triangles(tri_clip, W, H, pipe, tri_valid=clip_valid)
            packed = [vs.world_pos, vs.world_normal, s.uvs, vs.world_tangent]
            attr = jnp.concatenate(packed, axis=-1)
            mat_flat = s.tri_material[:, None].astype(jnp.float32)
            vis, vary = rasterize_binned_pallas(
                setup, H, W, pipe,
                varyings=None, varyings_soa=(attr, s.tris),
                vary_src=clip_src, vary_bary_planes=cbp,
                flat_varyings=mat_flat, skip_bary=True, small_limit=T,
                defer_varyings=defer, chunk=chunk,
            )
            return vis.depth.sum() + vary.sum()
        return f

    if want("defer_kernel64"):
        res["defer_kernel64"] = bench(mk("kernel", 64))
        print("defer_kernel64", res["defer_kernel64"], flush=True)
    if want("defer_kernel32"):
        res["defer_kernel32"] = bench(mk("kernel", 32))
        print("defer_kernel32", res["defer_kernel32"], flush=True)
    if want("defer_soa128"):
        res["defer_soa128"] = bench(mk(True, 128))
        print("defer_soa128", res["defer_soa128"], flush=True)

print(json.dumps(res))
