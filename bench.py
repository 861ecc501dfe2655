"""Benchmark: the BASELINE.json headline metric on one chip.

Renders the full-frame config at 1080p/100k tris on the default backend
(the real TPU under the driver) and reports FPS / Mtri/s / Mpix/s.

The HEADLINE number is the TEXTURED scene — BASELINE.json configs[4] and
the north star name a "textured PBR glTF scene" (5-slot 256² PBR maps,
app/scenes.full_scene(textured=True)); the untextured variant rides along
as a secondary field. Also reported (VERDICT r2 items 8-9):

- bin_overflow: compact binning has NO per-bin density cap (segments are
  exact), but its big/huge expansion classes have entry capacities;
  overflow would drop candidates — reported per pass, must be 0.
- checksum drift guard: mean |linear HDR| of the textured frame vs the
  committed reference in bench_ref.json (catches Mosaic/remote-compile
  numeric drift the run it happens). Regenerate intentionally with
  BENCH_REGEN_REF=1 after visual-affecting changes.

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


def _bench_frame(frame_fn, scene, frames):
    """Time `frames` dispatches of frame_fn(scene).

    Each iteration perturbs the vertex positions by a distinct ~1e-12
    epsilon INSIDE the jit (the probes' pattern): the TPU tunnel serves
    a result cache for bit-identical dispatches, and looping a jitted fn
    on the same inputs can read absurdly fake-fast through it (CLAUDE.md;
    observed: a 17 kFPS "dancer" reading on 2026-08-21). The epsilon is
    visually nil and keeps the checksum drift guard within tolerance."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(
        lambda s, eps: frame_fn(s.replace(positions=s.positions + eps))
    )
    out = f(scene, jnp.float32(0.0))
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(frames):
        out = f(scene, jnp.float32((i + 1) * 1e-12))
    out.block_until_ready()
    return frames / (time.perf_counter() - t0), out


def _arm_watchdog():
    """If the TPU tunnel is down, device discovery hangs indefinitely; emit
    an explicit failure line instead of hanging the caller. The budget is
    generous (cold persistent-cache compiles take 10+ min through the
    remote-compile hop); override with BENCH_WATCHDOG_S, 0 disables."""
    import threading

    budget = float(os.environ.get("BENCH_WATCHDOG_S", "2700"))
    if budget <= 0:
        return

    def fire():
        print(
            json.dumps(
                {
                    "metric": "full_frame_fps_textured",
                    "value": 0.0,
                    "unit": "frames/sec (BENCH FAILED: watchdog expired — "
                    "TPU tunnel unreachable or compile stalled)",
                    "vs_baseline": 0.0,
                    "error": f"watchdog expired after {budget:.0f}s",
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(budget, fire)
    t.daemon = True
    t.start()
    return t


def main() -> int:
    width, height = (1920, 1080)
    tri_budget = 100_000
    frames = int(os.environ.get("BENCH_FRAMES", "16"))
    small = bool(os.environ.get("BENCH_SMALL"))
    if small:  # quick CPU smoke
        width, height, tri_budget, frames = 320, 240, 5_000, 4

    wd = _arm_watchdog()

    import jax

    from renderer_rs_tpu.core.config import ensure_f32_matmuls

    ensure_f32_matmuls()

    if small:
        # force the CPU backend (the axon sitecustomize overrides
        # JAX_PLATFORMS, so the env var alone does not stick)
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: repeated bench/profile runs skip the
    # 50-80s remote-compile hop for unchanged programs
    repo = os.path.dirname(os.path.abspath(__file__))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.ops.clip import clip_triangles_near
    from renderer_rs_tpu.ops.raster import gather_triangle_clip, setup_triangles
    from renderer_rs_tpu.renderer.passes import (
        forward_frame,
        shadow_vertex_stage,
        vertex_stage,
    )
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    pipeline = GraphicsPipelineBuilder().build()
    result = {}
    fps_by_kind = {}
    out_tex = None
    scene_tex = layout_tex = kwargs_tex = None
    for kind, textured in (("textured", True), ("untextured", False)):
        scene, layout, kwargs, _ = full_scene(
            width, height, tri_budget=tri_budget, textured=textured
        )
        shading = kwargs["shading"]

        def frame(s, layout=layout, kwargs=kwargs, shading=shading):
            return forward_frame(
                s, layout, pipeline, shading, width, height,
                tonemap=kwargs.get("tonemap", "aces"),
                shadow_map_size=kwargs.get("shadow_map_size", 1024),
                shadow_params=kwargs.get("shadow_params"),
            )

        t0 = time.perf_counter()
        fps, out = _bench_frame(frame, scene, frames)
        fps_by_kind[kind] = fps
        if textured:
            result["compile_s"] = round(time.perf_counter() - t0, 2)
            out_tex = out
            scene_tex, layout_tex, kwargs_tex = scene, layout, kwargs

            # secondary HONEST metric: the Renderer's production split —
            # shadow map cached across frames of a static sun+geometry
            # (renderer.py::_run_frame), forward pass only per frame. The
            # headline above keeps the per-frame shadow render (animated-
            # scene cost); this is the static-scene/orbit-camera number.
            from renderer_rs_tpu.renderer.passes import shadow_map_pass

            smap = jax.jit(
                lambda s: shadow_map_pass(
                    s, layout, kwargs.get("shadow_map_size", 1024)
                )
            )(scene)
            smap.block_until_ready()

            def frame_cached(s, layout=layout, kwargs=kwargs, shading=shading):
                return forward_frame(
                    s, layout, pipeline, shading, width, height,
                    tonemap=kwargs.get("tonemap", "aces"),
                    shadow_map_size=kwargs.get("shadow_map_size", 1024),
                    shadow_params=kwargs.get("shadow_params"),
                    shadow_map=smap,
                )

            fps_static, _ = _bench_frame(frame_cached, scene, frames)
            result["static_scene_fps"] = round(fps_static, 3)

    # --- true-glTF workload: the reference's dancer asset instanced to the
    # budget (17.2k tris x 6 = ~103k; real normal map through the glTF
    # pipeline). textured=True applies the textured-override (VERDICT r3
    # Missing 4): the base/MR maps stripped to 1x1 white by
    # .MISSING_LARGE_BLOBS are replaced with procedural 256^2 maps so the
    # number carries full texture-fetch cost. Secondary field: the
    # headline stays the 5-slot textured scene.
    dancer = os.environ.get(
        "BENCH_GLTF",
        "/root/reference/assets/models/a_contortionist_dancer/scene.gltf",
    )
    if dancer and os.path.exists(dancer) and not small:
        scene_g, layout_g, kwargs_g, _ = full_scene(
            width, height, tri_budget=tri_budget, gltf=dancer, textured=True
        )

        def frame_g(s, layout=layout_g, kwargs=kwargs_g):
            return forward_frame(
                s, layout, pipeline, kwargs["shading"], width, height,
                tonemap=kwargs.get("tonemap", "aces"),
                shadow_map_size=kwargs.get("shadow_map_size", 1024),
                shadow_params=kwargs.get("shadow_params"),
            )

        fps_g, _ = _bench_frame(frame_g, scene_g, frames)
        result["gltf_dancer_fps"] = round(fps_g, 3)
        result["gltf_dancer_tris"] = layout_g.num_triangles

    # --- CSM at flagship scale (VERDICT r4 item 7): the richest shader
    # path (model_pbr_ibl_csm.hlsl:118-292 / shadow_csm.hlsli:56-166 —
    # 4 camera-fitted cascades re-rendered per frame + cascade-selected
    # PCF) priced at the same 1080p/100k textured workload as the
    # headline, not presumed from the 160x120 goldens.
    scene_c, layout_c, kwargs_c, _ = full_scene(
        width, height, tri_budget=tri_budget, textured=True, csm=True
    )

    def frame_c(s, layout=layout_c, kwargs=kwargs_c):
        return forward_frame(
            s, layout, pipeline, kwargs["shading"], width, height,
            tonemap=kwargs.get("tonemap", "aces"),
            shadow_map_size=kwargs.get("shadow_map_size", 1024),
            shadow_params=kwargs.get("shadow_params"),
        )

    fps_c, _ = _bench_frame(frame_c, scene_c, frames)
    result["csm_fps"] = round(fps_c, 3)

    # --- msaa4 at flagship scale (VERDICT r4 item 8): the shade-once
    # resolve default (sample-rate visibility + pixel-rate shading,
    # ops/msaa.py; RENDERER_MSAA=super restores supersampling at ~2x).
    import dataclasses as _dc

    pipe4 = _dc.replace(pipeline, msaa_samples=4)

    def frame_m(s, layout=layout_tex, kwargs=kwargs_tex):
        return forward_frame(
            s, layout, pipe4, kwargs["shading"], width, height,
            tonemap=kwargs.get("tonemap", "aces"),
            shadow_map_size=kwargs.get("shadow_map_size", 1024),
            shadow_params=kwargs.get("shadow_params"),
        )

    fps_m, _ = _bench_frame(frame_m, scene_tex, frames)
    result["msaa4_fps"] = round(fps_m, 3)

    # --- deviation telemetry: density-cap truncation on both passes --------
    sm = kwargs_tex.get("shadow_map_size", 1024)

    @jax.jit
    def overflow_probe(s):
        from renderer_rs_tpu.ops.raster_pallas import _bin_compact

        vs = vertex_stage(s, layout_tex)
        tri_clip = gather_triangle_clip(vs.clip, s.tris)
        tri_clip, clip_valid, _, _ = clip_triangles_near(tri_clip)
        setup = setup_triangles(
            tri_clip, width, height, pipeline, tri_valid=clip_valid
        )
        _, _, _, _, ov_f = _bin_compact(
            setup, height, width, 32, 128, 16, 64,
            small_limit=layout_tex.num_triangles,
        )
        sclip = shadow_vertex_stage(s, layout_tex)
        ssetup = setup_triangles(
            gather_triangle_clip(sclip, s.tris), sm, sm, pipeline
        )
        _, _, _, _, ov_s = _bin_compact(ssetup, sm, sm, 32, 128, 16, 64)
        return ov_f, ov_s

    ov_f, ov_s = overflow_probe(scene_tex)
    tf, mf = int(ov_f[0]), int(ov_f[1])
    ts, ms = int(ov_s[0]), int(ov_s[1])

    # deviation telemetry (VERDICT r2 item 9 + r4 clip compaction): one
    # diagnostics frame yields the bounded-path counters — depth-peel
    # exhaustion (structurally 0 while no MASK material is bound) and
    # near-clip secondary halves dropped beyond the compaction cap.
    _, diag = jax.jit(
        lambda s: forward_frame(
            s, layout_tex, pipeline, kwargs_tex["shading"], width, height,
            tonemap=kwargs_tex.get("tonemap", "aces"),
            shadow_map_size=sm,
            shadow_params=kwargs_tex.get("shadow_params"),
            diagnostics=True,
        )
    )(scene_tex)
    peel_exhausted = int(diag["peel_exhausted"])
    clip_overflow = int(diag["clip_overflow"])

    # --- numeric drift guard -----------------------------------------------
    check = float(jnp.mean(jnp.abs(out_tex)))
    ref_path = os.path.join(repo, "bench_ref.json")
    checksum_status = "no_reference"
    if small:
        checksum_status = "skipped_small"
    elif os.environ.get("BENCH_REGEN_REF") or not os.path.exists(ref_path):
        with open(ref_path, "w") as f:
            json.dump({"mean_abs_textured_1080p": check}, f)
        checksum_status = "reference_written"
    else:
        ref = json.load(open(ref_path))["mean_abs_textured_1080p"]
        drift = abs(check - ref) / max(abs(ref), 1e-9)
        checksum_status = "ok" if drift < 5e-3 else f"DRIFT {drift:.4f} vs {ref:.6f}"

    fps = fps_by_kind["textured"]
    tris = layout_tex.num_triangles
    result.update(
        {
            "metric": "full_frame_fps_textured",
            "value": round(fps, 3),
            "unit": (
                f"frames/sec @ {width}x{height}, {tris} tris, 5-slot 256^2 "
                "PBR textures, shadow+PBR+IBL+sky+ACES"
            ),
            "vs_baseline": round(fps / 60.0, 4),
            "untextured_fps": round(fps_by_kind["untextured"], 3),
            "mtri_per_s": round(fps * tris / 1e6, 3),
            "mpix_per_s": round(fps * width * height / 1e6, 2),
            "frame_ms": round(1000.0 / fps, 2),
            "bin_overflow": {
                "forward_big": tf,
                "forward_huge": mf,
                "shadow_big": ts,
                "shadow_huge": ms,
            },
            "peel_exhausted": peel_exhausted,
            "clip_overflow": clip_overflow,
            "checksum": round(check, 6),
            "checksum_status": checksum_status,
            "device": str(jax.devices()[0]),
        }
    )
    if wd is not None:
        wd.cancel()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
