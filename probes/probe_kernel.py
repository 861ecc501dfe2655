"""Isolate the two-level raster kernel regression: time kernel variants
directly on the bench geometry. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_kernel.py
"""

import json
import os
import pickle
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join("/root/repo", ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CACHE = "/tmp/probe_setup.pkl"


def get_inputs():
    import numpy as np

    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.ops.clip import clip_triangles_near
    from renderer_rs_tpu.ops.raster import gather_triangle_clip, setup_triangles
    from renderer_rs_tpu.renderer.passes import vertex_stage
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    W, H = 1920, 1080
    scene, layout, kwargs, _ = full_scene(W, H, tri_budget=100_000, ibl=False)
    pipe = GraphicsPipelineBuilder().build()

    @jax.jit
    def prep(s):
        vs = vertex_stage(s, layout)
        tri_clip = gather_triangle_clip(vs.clip, s.tris)
        tri_clip, clip_valid, clip_src, clip_bary = clip_triangles_near(tri_clip)
        setup = setup_triangles(tri_clip, W, H, pipe, tri_valid=clip_valid)
        packed = jnp.concatenate([vs.world_pos, vs.world_normal], axis=-1)
        return setup, clip_src, clip_bary, packed[s.tris]

    setup, clip_src, clip_bary, tri_attr = prep(scene)

    from renderer_rs_tpu.renderer.passes import shadow_vertex_stage

    @jax.jit
    def sprep(s):
        clip = shadow_vertex_stage(s, layout)
        return setup_triangles(
            gather_triangle_clip(clip, s.tris), 1024, 1024, pipe
        )

    ssetup = sprep(scene)
    data = dict(
        setup=jax.tree.map(np.asarray, setup),
        ssetup=jax.tree.map(np.asarray, ssetup),
        clip_src=np.asarray(clip_src),
        clip_bary=np.asarray(clip_bary),
        tri_attr=np.asarray(tri_attr),
    )
    with open(CACHE, "wb") as f:
        pickle.dump(data, f)
    return data


def timeit(fn, *args, n=6):
    # the remote-compile tunnel caches IDENTICAL dispatches (fake-fast
    # readings, CLAUDE.md gotcha): perturb a traced epsilon per iteration
    # so every dispatch is distinct, keeping async pipelining
    import jax.numpy as _jnp

    def run(eps):
        return fn(*args, _probe_eps=eps)

    out = run(_jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = run(_jnp.float32((i + 1) * 1e-12))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import numpy as np

    from renderer_rs_tpu.ops.raster import TriangleSetup
    from renderer_rs_tpu.ops.raster_pallas import rasterize_binned_pallas
    from renderer_rs_tpu.renderer.passes import _binned_cap
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    W, H = 1920, 1080
    data = get_inputs()
    setup = jax.tree.map(jnp.asarray, data["setup"])
    if not isinstance(setup, TriangleSetup):
        setup = TriangleSetup(**{k: jnp.asarray(v) for k, v in data["setup"].items()})
    ssetup = data.get("ssetup")
    if ssetup is not None and not isinstance(ssetup, TriangleSetup):
        ssetup = TriangleSetup(**{k: jnp.asarray(v) for k, v in ssetup.items()})
    clip_src = jnp.asarray(data["clip_src"])
    clip_bary = jnp.asarray(data["clip_bary"])
    tri_attr = jnp.asarray(data["tri_attr"])
    pipe = GraphicsPipelineBuilder().build()
    t = int(setup.num_triangles)
    res = {}

    variants = {
        "sub16_vary6": dict(sub_h=16, vary=True),
        "sub16_vary6_skipbary": dict(sub_h=16, vary=True, skip_bary=True),
        "sub16_novary": dict(sub_h=16, vary=False),
        "sub16_depthonly": dict(sub_h=16, vary=False, depth_only=True),
        "sub32_vary6": dict(sub_h=32, vary=True),
        "t64_sub16_vary6": dict(sub_h=16, tile_h=64, vary=True),
        "t64_sub16_depthonly": dict(sub_h=16, tile_h=64, vary=False, depth_only=True),
        "sub16_vary6_chunk128": dict(sub_h=16, vary=True, chunk=128),
        "shadow_sub16": dict(sub_h=16, vary=False, depth_only=True, shadow=True),
        "shadow_sub32": dict(sub_h=32, vary=False, depth_only=True, shadow=True),
        "shadow_sub16_c32": dict(sub_h=16, vary=False, depth_only=True, shadow=True, chunk=32),
        "fwd_inframe": dict(sub_h=16, vary=True, skip_bary=True, small=True),
    }
    which = os.environ.get("PROBE", "").split(",") if os.environ.get("PROBE") else list(variants)
    for name in which:
        v = variants[name]
        hh, ww = (1024, 1024) if v.get("shadow") else (H, W)
        st = ssetup if v.get("shadow") else setup
        kw = dict(sub_h=v["sub_h"], tile_h=v.get("tile_h", 32),
                  depth_only=v.get("depth_only", False),
                  chunk=v.get("chunk", 64), skip_bary=v.get("skip_bary", False))
        if v.get("small"):
            kw.update(small_limit=t // 2)
        if v["vary"]:
            kw.update(varyings=tri_attr, vary_src=clip_src, vary_bary=clip_bary,
                      ids=clip_src)

        def run(s, _probe_eps=0.0, kw=kw, hh=hh, ww=ww):
            s = s.replace(z=s.z + _probe_eps)
            return rasterize_binned_pallas(s, hh, ww, pipe, **kw)

        try:
            ms = timeit(jax.jit(run), st)
        except Exception as e:  # keep probing other variants
            ms = f"FAIL {type(e).__name__}: {str(e)[:120]}"
        res[name] = round(ms, 2) if isinstance(ms, float) else ms
        print(name, "->", res[name], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
