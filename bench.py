"""Benchmark: the BASELINE.json headline metric on one chip.

Renders the full-frame config (shadow-mapped sun + PBR + skybox + ACES
tonemap, ~100k triangles) at 1080p on the default backend (the real TPU
under the driver) and reports FPS / Mtri/s / Mpix/s.

vs_baseline: the reference publishes no numbers (BASELINE.md); the north
star is 60 FPS at this workload, so vs_baseline = fps / 60.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    width, height = (1920, 1080)
    tri_budget = 100_000
    frames = int(os.environ.get("BENCH_FRAMES", "16"))
    if os.environ.get("BENCH_SMALL"):  # quick CPU smoke
        width, height, tri_budget, frames = 320, 240, 5_000, 4

    import jax

    if os.environ.get("BENCH_SMALL"):
        # force the CPU backend (the axon sitecustomize overrides
        # JAX_PLATFORMS, so the env var alone does not stick)
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: repeated bench/profile runs skip the
    # 50-80s remote-compile hop for unchanged programs
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    scene, layout, kwargs, _ = full_scene(width, height, tri_budget=tri_budget)
    pipeline = GraphicsPipelineBuilder().build()
    shading = kwargs["shading"]

    @jax.jit
    def frame(s):
        return forward_frame(
            s, layout, pipeline, shading, width, height,
            tonemap=kwargs.get("tonemap", "aces"),
            shadow_map_size=kwargs.get("shadow_map_size", 1024),
        )

    t0 = time.perf_counter()
    out = frame(scene)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0

    # timed run: async submit all, block on the last (the frame-manager
    # pipelining pattern, ≙ frames-in-flight)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = frame(scene)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    fps = frames / elapsed
    tris = layout.num_triangles
    result = {
        "metric": "full_frame_fps",
        "value": round(fps, 3),
        "unit": f"frames/sec @ {width}x{height}, {tris} tris, shadow+PBR+sky+ACES",
        "vs_baseline": round(fps / 60.0, 4),
        "mtri_per_s": round(fps * tris / 1e6, 3),
        "mpix_per_s": round(fps * width * height / 1e6, 2),
        "frame_ms": round(1000.0 / fps, 2),
        "compile_s": round(compile_s, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
