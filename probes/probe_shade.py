"""Shade-stage decomposition by stub-substitution on the full textured
frame (probe_frame_ab.py pattern: replace ONE component with a near-free
stub, measure the frame delta — attributes cost in-context, with XLA
fusion effects included).

Components stubbed (each keeps output shape/dtype and a tiny data
dependence so nothing constant-folds or changes downstream structure):
  stub_atlas  — material-atlas trilinear fetch (the [2M,104]bf16 gather)
  stub_pcf    — whole sun-shadow factor (projection + window gather + PCF)
  stub_cube   — specular/sky cube-atlas fetch (the [2M,39]f32 gather)
  stub_pbr    — Cook-Torrance direct (GGX/Smith/Fresnel VPU math)
  stub_ibl    — SH9 + analytic-BRDF ambient
  notonemap   — tonemap="none" instead of ACES
Plus PCF grouping sweep (pcf_g4 / pcf_g16: table rows 262k/65k at widths
36/144 — sizes the table-rows-vs-width gather model on the live path).

Usage: python probes/probe_shade.py [all|base|stub_atlas|...]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/probes")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

if os.environ.get("PROBE_SMALL"):
    # CPU smoke: verifies every stub patch point traces (run before
    # burning TPU time); numbers are meaningless
    jax.config.update("jax_platforms", "cpu")
    from renderer_rs_tpu.app.scenes import full_scene

    W, H = 320, 240
    scene, layout, kwargs, _ = full_scene(W, H, tri_budget=5_000, textured=True)
else:
    from scene_cache_tex import get_full_scene_tex

    W, H = 1920, 1080
    scene, layout, kwargs = get_full_scene_tex()
pipe = GraphicsPipelineBuilder().build()
FRAMES = int(os.environ.get("AB_FRAMES", "16"))


def bench(make_frame):
    @jax.jit
    def f(eps):
        s = scene.replace(positions=scene.positions + eps)
        return make_frame(s)

    out = f(jnp.float32(0.0))
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = f(jnp.float32((i + 1) * 1e-12))
    out.block_until_ready()
    return round((time.perf_counter() - t0) / FRAMES * 1000.0, 2)


def frame_fn(s, tonemap=None):
    from renderer_rs_tpu.renderer.passes import forward_frame

    return forward_frame(
        s, layout, pipe, kwargs["shading"], W, H,
        tonemap=kwargs.get("tonemap", "aces") if tonemap is None else tonemap,
        shadow_map_size=kwargs.get("shadow_map_size", 1024),
        shadow_params=kwargs.get("shadow_params"),
    )


res = {}
which = sys.argv[1] if len(sys.argv) > 1 else "all"


def want(k):
    return which in ("all", k)


if want("base"):
    res["base"] = bench(frame_fn)
    print("base", res["base"], flush=True)

if want("stub_atlas"):
    import renderer_rs_tpu.ops.sampling as sampling

    real = sampling.sample_material_atlas_tri

    def stub(atlas, offsets, sizes, n_levels, base_hw, c, mid, uv,
             sampler=None, **kw):
        # **kw keeps the stub signature-proof against new keyword args on
        # the real fetch (lod / y_parity — the r5 probe_shade RC=1)
        return jnp.ones(uv.shape[:-1] + (c,), jnp.float32) * (
            uv[..., :1] * 1e-8 + 1.0
        )

    sampling.sample_material_atlas_tri = stub
    res["stub_atlas"] = bench(frame_fn)
    sampling.sample_material_atlas_tri = real
    print("stub_atlas", res["stub_atlas"], flush=True)

if want("stub_pcf"):
    # whole sun-shadow factor -> ~1.0 (kills projection, window build,
    # gather, and mask-reduce; keeps the multiply into lo)
    import renderer_rs_tpu.renderer.passes as passes

    real = passes.calculate_shadow

    def stub(shadow_map, lsm, world_pos, normal, light_dir, params=None, **kw):
        return 1.0 + world_pos[..., 0] * 1e-12

    passes.calculate_shadow = stub
    res["stub_pcf"] = bench(frame_fn)
    passes.calculate_shadow = real
    print("stub_pcf", res["stub_pcf"], flush=True)

if want("stub_cube"):
    import renderer_rs_tpu.ops.sampling as sampling

    real = sampling.cube_trilinear_fetch

    def stub(atlas13, offsets, sizes, lo_level, frac, face, uv, c, **kw):
        return (
            jnp.ones(uv.shape[:-1] + (c,), jnp.float32)
            * (uv[..., :1] * 1e-8 + 0.5)
        )

    sampling.cube_trilinear_fetch = stub
    res["stub_cube"] = bench(frame_fn)
    sampling.cube_trilinear_fetch = real
    print("stub_cube", res["stub_cube"], flush=True)

if want("stub_pbr"):
    # Cook-Torrance direct -> Lambert (keeps shapes + radiance shape deps)
    import renderer_rs_tpu.ops.pbr as pbr_ops

    real = pbr_ops.pbr_direct

    def stub(normal, view_dir, light_dir, radiance, mat):
        ndotl = jnp.maximum(
            jnp.sum(normal * light_dir, -1, keepdims=True), 0.0
        )
        return mat.albedo * radiance * ndotl

    pbr_ops.pbr_direct = stub
    res["stub_pbr"] = bench(frame_fn)
    pbr_ops.pbr_direct = real
    print("stub_pbr", res["stub_pbr"], flush=True)

if want("stub_ibl"):
    import renderer_rs_tpu.ops.pbr as pbr_ops

    real = pbr_ops.calculate_ibl_fast

    def stub(normal, view_dir, mat, sh, spec):
        return mat.albedo * 0.2 + spec * 1e-8

    pbr_ops.calculate_ibl_fast = stub
    res["stub_ibl"] = bench(frame_fn)
    pbr_ops.calculate_ibl_fast = real
    print("stub_ibl", res["stub_ibl"], flush=True)

if want("notonemap"):
    res["notonemap"] = bench(lambda s: frame_fn(s, tonemap="none"))
    print("notonemap", res["notonemap"], flush=True)

if want("stub_raster"):
    # whole raster block (geom slice kept tiny by DCE + bin + kernel +
    # defer resolve) -> synthetic vis/varyings with per-pixel variation so
    # every downstream gather keeps realistic (non-constant) indices
    import renderer_rs_tpu.ops.raster_pallas as rp

    real = rp.rasterize_binned_pallas
    T = layout.num_triangles

    def stub(setup, height, width, pipeline, **kw):
        from renderer_rs_tpu.ops.raster import VisibilityBuffer

        yy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
        dep = setup.z[0, 0] * 1e-12
        if kw.get("depth_only"):
            # shadow_map_pass rides the same entry point: keep its contract
            # (a [H,W] depth map), stubbed to a varying constant
            return 0.6 + dep + (yy + xx) * 1e-7
        tid = (yy * width + xx).astype(jnp.int32) % T
        vis = VisibilityBuffer(
            tri_id=tid,
            depth=0.5 + dep + (yy + xx) * 1e-7,
            bary=jnp.zeros((height, width, 2), jnp.float32),
        )
        k = 13  # wp3 + n3 + uv2 + tan4 + matid1 (flagship defer layout)
        chan = jnp.arange(1, k + 1, dtype=jnp.float32)
        vary = 0.3 + dep + (xx[..., None] + yy[..., None]) * 1e-4 * chan
        vary = vary.at[..., -1].set(0.0)  # material id lane: exact 0
        return vis, vary

    rp.rasterize_binned_pallas = stub
    res["stub_raster"] = bench(frame_fn)
    rp.rasterize_binned_pallas = real
    print("stub_raster", res["stub_raster"], flush=True)

if want("stub_shadowmap"):
    # shadow-map render -> constant map (keeps the PCF projection/gather/
    # reduce live; isolates the depth-only raster pass at frame level)
    import renderer_rs_tpu.renderer.passes as passes

    real = passes.shadow_map_pass

    def stub(scene_, layout_, size, light_matrix=None, world_pos=None):
        return jnp.full((size, size), 1.0, jnp.float32) + (
            scene_.positions[0, 0] * 1e-12
        )

    passes.shadow_map_pass = stub
    res["stub_shadowmap"] = bench(frame_fn)
    passes.shadow_map_pass = real
    print("stub_shadowmap", res["stub_shadowmap"], flush=True)

if want("pcf_yhalf"):
    # y-only half-rate PCF (sublane-stride subsample; lanes stay 128-wide)
    os.environ["RENDERER_PCF_RES"] = "yhalf"
    res["pcf_yhalf"] = bench(frame_fn)
    del os.environ["RENDERER_PCF_RES"]
    print("pcf_yhalf", res["pcf_yhalf"], flush=True)

for g in (4, 16, 32, 64):
    key = f"pcf_g{g}"
    if want(key):
        os.environ["RENDERER_PCF_GROUP"] = str(g)
        res[key] = bench(frame_fn)
        del os.environ["RENDERER_PCF_GROUP"]
        print(key, res[key], flush=True)

if want("pcf_group_layout"):
    # the pre-halo window layout (72-lane rows, 9-plane build); halo
    # (30-lane rows, 3-plane build + x-halo select) is the default
    os.environ["RENDERER_PCF_LAYOUT"] = "group"
    res["pcf_group_layout"] = bench(frame_fn)
    del os.environ["RENDERER_PCF_LAYOUT"]
    print("pcf_group_layout", res["pcf_group_layout"], flush=True)

if want("pcf_build0"):
    # halo-table BUILD cost: constant table (same shape), keeps the
    # gather + reduce live via a tiny data dependence
    import renderer_rs_tpu.ops.shadow as shadow_mod

    real = shadow_mod.build_halo_rows

    def stub(shadow_map, group):
        h, w = shadow_map.shape[0], shadow_map.shape[1]
        return jnp.full(
            (h * (w // group), 3 * (group + 2)), 0.5, jnp.float32
        ) + shadow_map[0, 0] * 1e-12

    shadow_mod.build_halo_rows = stub
    res["pcf_build0"] = bench(frame_fn)
    shadow_mod.build_halo_rows = real
    print("pcf_build0", res["pcf_build0"], flush=True)

if want("pcf_reduce0"):
    # mask-REDUCE cost: keep build+gather, reduce -> first lane
    import renderer_rs_tpu.ops.shadow as shadow_mod

    real = shadow_mod.halo_window_reduce

    def stub(wide, sub, current, group):
        return wide[..., 0] * 1e-12 + 0.9 + current * 1e-12

    shadow_mod.halo_window_reduce = stub
    res["pcf_reduce0"] = bench(frame_fn)
    shadow_mod.halo_window_reduce = real
    print("pcf_reduce0", res["pcf_reduce0"], flush=True)

if want("pcf_proj0"):
    # PROJECTION cost (runs twice: bounds + offset): cheap linear stand-in
    import renderer_rs_tpu.ops.shadow as shadow_mod

    real = shadow_mod._project_to_shadow_uv

    def stub(lsm, p):
        uv = p[..., :2] * 0.05 + 0.5 + lsm[0, 0] * 1e-12
        return uv, p[..., 2] * 0.05 + 0.5

    shadow_mod._project_to_shadow_uv = stub
    res["pcf_proj0"] = bench(frame_fn)
    shadow_mod._project_to_shadow_uv = real
    print("pcf_proj0", res["pcf_proj0"], flush=True)

if want("pcf_halo4"):
    # halo at group=4: 18-lane rows, 262k-row table
    os.environ["RENDERER_PCF_GROUP"] = "4"
    res["pcf_halo4"] = bench(frame_fn)
    del os.environ["RENDERER_PCF_GROUP"]
    print("pcf_halo4", res["pcf_halo4"], flush=True)

if want("pcf_halo16"):
    # halo at group=16: 54-lane rows, 65k-row table
    os.environ["RENDERER_PCF_LAYOUT"] = "halo"
    os.environ["RENDERER_PCF_GROUP"] = "16"
    res["pcf_halo16"] = bench(frame_fn)
    del os.environ["RENDERER_PCF_GROUP"]
    del os.environ["RENDERER_PCF_LAYOUT"]
    print("pcf_halo16", res["pcf_halo16"], flush=True)

print(json.dumps(res))
