"""Shadow-pass decomposition at 1024^2 (textured 1080p flagship scene)."""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/probes")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from scene_cache_tex import get_full_scene_tex
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

scene, layout, kwargs = get_full_scene_tex()
SM = kwargs.get("shadow_map_size", 1024)
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


from renderer_rs_tpu.ops.raster import gather_triangle_clip, setup_triangles
from renderer_rs_tpu.ops.raster_binned import bin_triangles_compact
from renderer_rs_tpu.renderer.passes import (
    _SHADOW_PIPELINE, shadow_map_pass, shadow_vertex_stage,
)
from renderer_rs_tpu.ops.raster_pallas import rasterize_binned_pallas, _bin_compact

T = layout.num_triangles
res = {}
which = sys.argv[1:] or ["all"]
want = lambda k: "all" in which or k in which


def sgeom(s):
    clip = shadow_vertex_stage(s, layout)
    return setup_triangles(
        gather_triangle_clip(clip, s.tris), SM, SM, _SHADOW_PIPELINE
    )


if want("pass"):
    res["pass"] = bench(lambda s: shadow_map_pass(s, layout, SM).sum())
    print("pass", res["pass"], flush=True)

if want("geom"):
    res["geom"] = bench(lambda s: sgeom(s).z.sum())
    print("geom", res["geom"], flush=True)

if want("bin"):
    def f(s):
        setup = sgeom(s)
        st, seg, nby, nbx, ov = bin_triangles_compact(setup, SM, SM, 16, 128)
        return st.sum() + seg.sum()
    res["bin"] = bench(f)
    print("bin", res["bin"], flush=True)

if want("classes"):
    # live candidate-class counts + binned-pair count (not a timing)
    @jax.jit
    def f(s):
        setup = sgeom(s)
        from renderer_rs_tpu.ops.raster_binned import _cdiv, _tile_ranges
        nby, nbx = _cdiv(SM, 16), _cdiv(SM, 128)
        tx0, tx1, ty0, ty1, alive = _tile_ranges(
            setup, SM, SM, 16, 128, nby, nbx, 0, 1
        )
        small_ok = ((tx1 - tx0) < 2) & ((ty1 - ty0) < 2)
        big_ok = ((tx1 - tx0) < 4) & ((ty1 - ty0) < 8)
        small = alive & small_ok
        big = alive & ~small & big_ok
        huge = alive & ~small & ~big_ok
        pairs = jnp.sum(
            jnp.where(alive, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
        )
        return (jnp.sum(alive), jnp.sum(small), jnp.sum(big), jnp.sum(huge), pairs)
    a, sm_, bg, hg, pr = [int(x) for x in f(scene)]
    res["classes"] = {"alive": a, "small": sm_, "big": bg, "huge": hg, "pairs": pr}
    print("classes", res["classes"], flush=True)

if want("kernel"):
    # full pass minus: isolate kernel by timing pass with precomputed sort?
    # simpler: depth-only pallas call on fresh geom (includes geom+bin)
    def f(s):
        setup = sgeom(s)
        return rasterize_binned_pallas(
            setup, SM, SM, _SHADOW_PIPELINE, depth_only=True
        ).sum()
    res["kernel_cum"] = bench(f)
    print("kernel_cum", res["kernel_cum"], flush=True)

if want("knobs"):
    # env-knob sweep (RENDERER_SHADOW_* / RENDERER_CAP_BIG read at trace
    # time): one probe run covers the candidate settings. cap overrides
    # can DROP candidates if set below the live big-class count — check
    # `classes` first; production overflow telemetry guards bench.
    for name, env in [
        ("sub32", {"RENDERER_SHADOW_SUB_H": "32"}),
        ("chunk32", {"RENDERER_SHADOW_CHUNK": "32"}),
        ("chunk128", {"RENDERER_SHADOW_CHUNK": "128"}),
        ("cap1024", {"RENDERER_CAP_BIG": "1024"}),
        ("tile16", {"RENDERER_SHADOW_TILE_H": "16"}),
    ]:
        os.environ.update(env)
        res[name] = bench(lambda s: shadow_map_pass(s, layout, SM).sum())
        for k in env:
            del os.environ[k]
        print(name, res[name], flush=True)

print(json.dumps(res))
