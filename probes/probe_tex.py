"""Triage the textured-frame cost: which part of the texture path eats the
time? Times full-frame variants on the TPU.
  PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_tex.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join("/root/repo", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, n=8):
    # defeat the remote tunnel's identical-dispatch caching (CLAUDE.md):
    # perturb a traced epsilon per iteration
    import jax.numpy as _jnp

    def run(eps):
        return fn(*args, _probe_eps=eps)

    out = run(_jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = run(_jnp.float32((i + 1) * 1e-12))
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / n * 1000.0, 2)


def main():
    import dataclasses

    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    W, H = 1920, 1080
    pipe = GraphicsPipelineBuilder().build()
    scene, layout, kwargs, _ = full_scene(W, H, tri_budget=100_000, textured=True)
    res = {}

    def frame(s, lay, _probe_eps=0.0):
        s = s.replace(positions=s.positions + _probe_eps)
        return forward_frame(
            s, lay, pipe, kwargs["shading"], W, H, tonemap="aces",
            shadow_map_size=1024, shadow_params=kwargs["shadow_params"],
        )

    which = os.environ.get("PROBE", "tex,tex_noatlas,tex_base_only,tex_slots_off").split(",")

    if "tex" in which:
        res["tex_full"] = timeit(
            jax.jit(lambda s, _probe_eps: frame(s, layout, _probe_eps)), scene
        )
        print("tex_full ->", res["tex_full"], flush=True)

    if "tex_noatlas" in which:
        # per-slot window-atlas path (pre-r3): mat_atlas disabled
        s2 = scene.replace(textures=scene.textures.replace(mat_atlas=None))
        res["tex_per_slot"] = timeit(
            jax.jit(lambda s, _probe_eps: frame(s, layout, _probe_eps)), s2
        )
        print("tex_per_slot ->", res["tex_per_slot"], flush=True)

    if "tex_base_only" in which:
        lay3 = dataclasses.replace(
            layout, texture_slots=(True, False, False, False, False)
        )
        res["tex_base_only"] = timeit(
            jax.jit(lambda s, _probe_eps: frame(s, lay3, _probe_eps)), scene
        )
        print("tex_base_only ->", res["tex_base_only"], flush=True)

    if "tex_slots_off" in which:
        # textures bound but no slot traced: isolates the kernel-varying cost
        lay4 = dataclasses.replace(layout, texture_slots=(False,) * 5)
        res["tex_slots_off"] = timeit(
            jax.jit(lambda s, _probe_eps: frame(s, lay4, _probe_eps)), scene
        )
        print("tex_slots_off ->", res["tex_slots_off"], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
