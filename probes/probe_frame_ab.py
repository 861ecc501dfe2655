"""Frame-level A/B of shade components on the cached textured 1080p scene."""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/probes")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

if os.environ.get("PROBE_SMALL"):
    # CPU smoke: every variant must RUN (validates the unattended
    # recovery-window ladder); timings are meaningless here
    jax.config.update("jax_platforms", "cpu")
    import renderer_rs_tpu.renderer.passes as _passes

    _passes._use_pallas = lambda: True  # interpret-mode kernel
    import jax.experimental.pallas as _pl
    import renderer_rs_tpu.ops.raster_pallas as _rp

    _orig_pc = _pl.pallas_call
    _rp.pl.pallas_call = lambda *a, **k: _orig_pc(*a, **{**k, "interpret": True})
    from renderer_rs_tpu.app.scenes import full_scene

    W, H = 256, 128
    scene, layout, kwargs, _ = full_scene(W, H, tri_budget=800, textured=True)
else:
    from scene_cache_tex import get_full_scene_tex

    W, H = 1920, 1080
    scene, layout, kwargs = get_full_scene_tex()
pipe = GraphicsPipelineBuilder().build()
FRAMES = int(os.environ.get("AB_FRAMES", "16"))


def bench(make_frame, scene_override=None):
    # eps-perturb the scene per iteration: defeats the tunnel's
    # identical-dispatch result cache (probe_ab.py pattern)
    base = scene if scene_override is None else scene_override

    @jax.jit
    def f(eps):
        s = base.replace(positions=base.positions + eps)
        return make_frame(s)

    out = f(jnp.float32(0.0))
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = f(jnp.float32((i + 1) * 1e-12))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / FRAMES * 1000.0
    return round(dt, 2)


def frame_fn(s):
    from renderer_rs_tpu.renderer.passes import forward_frame

    return forward_frame(
        s, layout, pipe, kwargs["shading"], W, H,
        tonemap=kwargs.get("tonemap", "aces"),
        shadow_map_size=kwargs.get("shadow_map_size", 1024),
        shadow_params=kwargs.get("shadow_params"),
    )


res = {}
which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "base"):
    res["base"] = bench(frame_fn)
    print("base", res["base"], flush=True)

if which in ("all", "stub_atlas"):
    # stub the material atlas fetch: constant neutral sample, keeps
    # lanes + TBN + everything else
    import renderer_rs_tpu.ops.sampling as sampling
    import renderer_rs_tpu.renderer.passes as passes

    real = sampling.sample_material_atlas_tri

    def stub(atlas, offsets, sizes, n_levels, base_hw, c, mid, uv, sampler=None, **kw):
        return jnp.ones(uv.shape[:-1] + (c,), jnp.float32) * (
            uv[..., :1] * 1e-8 + 1.0
        )

    sampling.sample_material_atlas_tri = stub
    res["stub_atlas"] = bench(frame_fn)
    sampling.sample_material_atlas_tri = real
    print("stub_atlas", res["stub_atlas"], flush=True)

if which in ("all", "pcf1"):
    os.environ["RENDERER_PCF_GROUP"] = "1"
    res["pcf1"] = bench(frame_fn)
    del os.environ["RENDERER_PCF_GROUP"]
    print("pcf1", res["pcf1"], flush=True)

if which in ("all", "defer0"):
    os.environ["RENDERER_DEFER_VARY"] = "0"
    res["defer0"] = bench(frame_fn)
    del os.environ["RENDERER_DEFER_VARY"]
    print("defer0", res["defer0"], flush=True)

if which in ("all", "kdefer"):
    # in-kernel winner-row dynamic_gather resolve: replaces the XLA-side
    # defer gather (6.5 ms) + blend relayouts (7.8 ms) with [sub_h, 128]
    # in-kernel ops; chunk=128 so the slab transpose fills the lane width
    os.environ["RENDERER_DEFER_VARY"] = "kernel"
    res["kdefer"] = bench(frame_fn)
    del os.environ["RENDERER_DEFER_VARY"]
    print("kdefer", res["kdefer"], flush=True)

if which in ("all", "kdefer32"):
    # kdefer with chunk=32 in the fused raster (stage probe: 22.13 vs 22.7)
    os.environ["RENDERER_DEFER_VARY"] = "kernel"
    os.environ["RENDERER_FUSE_CHUNK"] = "32"
    res["kdefer32"] = bench(frame_fn)
    del os.environ["RENDERER_DEFER_VARY"], os.environ["RENDERER_FUSE_CHUNK"]
    print("kdefer32", res["kdefer32"], flush=True)

if which in ("all", "dmatmul"):
    os.environ["RENDERER_DEFER_MATMUL"] = "1"
    res["dmatmul"] = bench(frame_fn)
    del os.environ["RENDERER_DEFER_MATMUL"]
    print("dmatmul", res["dmatmul"], flush=True)

if which in ("all", "dtbl"):
    os.environ["RENDERER_DEFER_TBL"] = "einsum"
    res["dtbl"] = bench(frame_fn)
    del os.environ["RENDERER_DEFER_TBL"]
    print("dtbl", res["dtbl"], flush=True)

if which in ("all", "flatmats"):
    os.environ["RENDERER_FLAT_MATS"] = "1"
    res["flatmats"] = bench(frame_fn)
    del os.environ["RENDERER_FLAT_MATS"]
    print("flatmats", res["flatmats"], flush=True)

if which in ("all", "packed"):
    # r3 packed-ids payload (the pre-arith default): arith src mapping is
    # the new base, so this measures what the old scheme costs
    os.environ["RENDERER_PACK_IDS"] = "1"
    res["packed"] = bench(frame_fn)
    del os.environ["RENDERER_PACK_IDS"]
    print("packed", res["packed"], flush=True)

if which in ("all", "bf16d"):
    # bf16 defer table: halves the winner-row gather traffic (quality knob)
    os.environ["RENDERER_DEFER_DTYPE"] = "bf16"
    res["bf16d"] = bench(frame_fn)
    del os.environ["RENDERER_DEFER_DTYPE"]
    print("bf16d", res["bf16d"], flush=True)

if which in ("all", "sub"):
    # vertex-sublane defer table [t,3,L]: einsum build (no 40-col stack),
    # 3-D winner gather, sublane-reduce blend (no vertex-block lane slices)
    os.environ["RENDERER_DEFER_SUBLANE"] = "table"
    res["sub_table"] = bench(frame_fn)
    os.environ["RENDERER_DEFER_SUBLANE"] = "reshape"
    res["sub_reshape"] = bench(frame_fn)
    del os.environ["RENDERER_DEFER_SUBLANE"]
    print("sub_table", res["sub_table"], "sub_reshape", res["sub_reshape"], flush=True)

if which in ("all", "blend"):
    # full-lane weighted window blends (no per-window slice relayouts) on
    # the material + cube atlas fetches: selection-matmul / reshape-reduce
    os.environ["RENDERER_BLEND"] = "matmul"
    res["blend_matmul"] = bench(frame_fn)
    os.environ["RENDERER_BLEND"] = "reshape"
    res["blend_reshape"] = bench(frame_fn)
    del os.environ["RENDERER_BLEND"]
    print("blend_matmul", res["blend_matmul"], "blend_reshape", res["blend_reshape"], flush=True)

if which in ("all", "vloop"):
    # per-object unrolled vertex stage (the pre-batch form)
    os.environ["RENDERER_VSTAGE"] = "loop"
    res["vloop"] = bench(frame_fn)
    del os.environ["RENDERER_VSTAGE"]
    print("vloop", res["vloop"], flush=True)

if which in ("mipplan",):
    # arithmetic mip plans (dynamic-shift level math) vs the unrolled
    # per-level select chains on the material + cube atlas fetches
    res["base"] = bench(frame_fn)
    print("base", res["base"], flush=True)
    os.environ["RENDERER_MIP_PLAN"] = "arith"
    res["mipplan_arith"] = bench(frame_fn)
    del os.environ["RENDERER_MIP_PLAN"]
    print("mipplan_arith", res["mipplan_arith"], flush=True)

if which in ("all", "merge"):
    # PCF window row + cube trilinear row in ONE gather (pass-count diet)
    os.environ["RENDERER_MERGE_GATHER"] = "1"
    res["merge"] = bench(frame_fn)
    del os.environ["RENDERER_MERGE_GATHER"]
    print("merge", res["merge"], flush=True)

if which in ("all", "ktbl"):
    # per-column stacked kernel coefficient table (the pre-r3 default;
    # block assembly won the A/B and is now the default)
    os.environ["RENDERER_KTBL"] = "stack"
    res["ktbl_stack"] = bench(frame_fn)
    del os.environ["RENDERER_KTBL"]
    print("ktbl_stack", res["ktbl_stack"], flush=True)

if which in ("all", "cubebf16"):
    # bf16 specular/sky cube atlas (cast the cached scene's atlas in place;
    # fresh builds get it via RENDERER_CUBE_DTYPE=bf16)
    env_ = scene.environment
    if env_ is not None and env_.atlas_tri is not None:
        s_bf = scene.replace(
            environment=env_.replace(
                atlas_tri=env_.atlas_tri.astype(jnp.bfloat16)
            )
        )
        res["cubebf16"] = bench(frame_fn, scene_override=s_bf)
        print("cubebf16", res["cubebf16"], flush=True)

if which in ("all", "flatfetch"):
    # flat-pixel material/cube fetches (gather+blend on [N,C] rows in the
    # gather's natural C-minor layout; kills the [H,W,104]/[H,W,39]
    # pre-blend layout copies probe_trace attributes 3.6 ms to)
    os.environ["RENDERER_FETCH_FLAT"] = "1"
    res["flatfetch"] = bench(frame_fn)
    del os.environ["RENDERER_FETCH_FLAT"]
    print("flatfetch", res["flatfetch"], flush=True)

if which in ("all", "postbar"):
    # barrier AFTER the window blend on the material/cube fetches: the
    # matmul blend is the gathers' single consumer, so the no-refetch
    # guarantee holds — and the gather output needs no {2,1,0}->{1,2,0}
    # whole-frame copy (probe_trace copy.826 1.6 + copy.840 2.0 ms)
    os.environ["RENDERER_BARRIER"] = "post"
    res["postbar"] = bench(frame_fn)
    del os.environ["RENDERER_BARRIER"]
    print("postbar", res["postbar"], flush=True)

if which in ("all", "postbar_mat"):
    os.environ["RENDERER_BARRIER"] = "mat"
    res["postbar_mat"] = bench(frame_fn)
    del os.environ["RENDERER_BARRIER"]
    print("postbar_mat", res["postbar_mat"], flush=True)

if which in ("all", "postbar_cube"):
    os.environ["RENDERER_BARRIER"] = "cube"
    res["postbar_cube"] = bench(frame_fn)
    del os.environ["RENDERER_BARRIER"]
    print("postbar_cube", res["postbar_cube"], flush=True)

if which in ("all", "pcfhalf"):
    # half-res shadow term (quarter the PCF stack's gather indexes,
    # bilinear-upsample the scalar lit factor) — quality-gated knob
    os.environ["RENDERER_PCF_RES"] = "half"
    res["pcfhalf"] = bench(frame_fn)
    del os.environ["RENDERER_PCF_RES"]
    print("pcfhalf", res["pcfhalf"], flush=True)

if which in ("msaa4",):
    # cost-transparency data point (VERDICT r3 item 7): the msaa4 flagship
    # frame (supersampled 3840x2160 + box resolve)
    msaa_pipe = GraphicsPipelineBuilder().msaa_samples(4).build()

    def frame_msaa(s):
        from renderer_rs_tpu.renderer.passes import forward_frame

        return forward_frame(
            s, layout, msaa_pipe, kwargs["shading"], W, H,
            tonemap=kwargs.get("tonemap", "aces"),
            shadow_map_size=kwargs.get("shadow_map_size", 1024),
            shadow_params=kwargs.get("shadow_params"),
        )

    res["msaa4"] = bench(frame_msaa)
    print("msaa4", res["msaa4"], flush=True)

if which in ("all", "triplanes"):
    # plane-form geometry chain (r4): per-vertex [T,4] gathers feed clip +
    # setup as flat planes; the [3T,4]->[T,3,4] reshape/slice/copy chain
    # and the [T,3,2] xy array never materialize on the fused path
    os.environ["RENDERER_TRI_PLANES"] = "1"
    res["triplanes"] = bench(frame_fn)
    del os.environ["RENDERER_TRI_PLANES"]
    print("triplanes", res["triplanes"], flush=True)

if which in ("all", "fusechunk16"):
    os.environ["RENDERER_FUSE_CHUNK"] = "16"
    res["fusechunk16"] = bench(frame_fn)
    del os.environ["RENDERER_FUSE_CHUNK"]
    print("fusechunk16", res["fusechunk16"], flush=True)

if which in ("all", "shcombo"):
    # shadow tile16 + sub16 together (today's sweep winners)
    os.environ["RENDERER_SHADOW_TILE_H"] = "16"
    os.environ["RENDERER_SHADOW_SUB_H"] = "16"
    res["shcombo"] = bench(frame_fn)
    del os.environ["RENDERER_SHADOW_TILE_H"], os.environ["RENDERER_SHADOW_SUB_H"]
    print("shcombo", res["shcombo"], flush=True)

if which in ("all", "capbig1024"):
    # smaller big-class cap (both passes): shrinks the fused-key sort;
    # overflow telemetry guards correctness (2026-08-20 shadow sweep:
    # cap1024 7.87 vs default ~10 ms shadow-pass time)
    os.environ["RENDERER_CAP_BIG"] = "1024"
    res["capbig1024"] = bench(frame_fn)
    del os.environ["RENDERER_CAP_BIG"]
    print("capbig1024", res["capbig1024"], flush=True)

if which in ("all", "shtile16"):
    os.environ["RENDERER_SHADOW_TILE_H"] = "16"
    res["shtile16"] = bench(frame_fn)
    del os.environ["RENDERER_SHADOW_TILE_H"]
    print("shtile16", res["shtile16"], flush=True)

if which in ("all", "edgecull"):
    # conservative edge-based bin rejection in the small-class expansion
    # (drops never-covering (bin, tri) pairs -> smaller kernel segments)
    os.environ["RENDERER_BIN_EDGECULL"] = "1"
    res["edgecull"] = bench(frame_fn)
    del os.environ["RENDERER_BIN_EDGECULL"]
    print("edgecull", res["edgecull"], flush=True)

if which in ("all", "deferxla"):
    # XLA-side defer resolve (RENDERER_DEFER_VARY=1) re-probe: the r3
    # measurement (60.75 vs kernel 56.9) predates the r4 frame diet
    os.environ["RENDERER_DEFER_VARY"] = "1"
    res["deferxla"] = bench(frame_fn)
    del os.environ["RENDERER_DEFER_VARY"]
    print("deferxla", res["deferxla"], flush=True)

if which in ("all", "fusesub32"):
    os.environ["RENDERER_FUSE_SUB_H"] = "32"
    res["fusesub32"] = bench(frame_fn)
    del os.environ["RENDERER_FUSE_SUB_H"]
    print("fusesub32", res["fusesub32"], flush=True)

if which in ("all", "cubeyquarter"):
    os.environ["RENDERER_CUBE_RES"] = "yquarter"
    res["cubeyquarter"] = bench(frame_fn)
    del os.environ["RENDERER_CUBE_RES"]
    print("cubeyquarter", res["cubeyquarter"], flush=True)

if which in ("all", "svworld2"):
    # shadow vertex stage from forward world_pos — re-probe under the
    # plane-form shadow setup default
    os.environ["RENDERER_SHADOW_VSTAGE"] = "world"
    res["svworld2"] = bench(frame_fn)
    del os.environ["RENDERER_SHADOW_VSTAGE"]
    print("svworld2", res["svworld2"], flush=True)

if which in ("all", "pcfyquarter"):
    os.environ["RENDERER_PCF_RES"] = "yquarter"
    res["pcfyquarter"] = bench(frame_fn)
    del os.environ["RENDERER_PCF_RES"]
    print("pcfyquarter", res["pcfyquarter"], flush=True)

if which in ("all", "triplanes_shadow"):
    # plane-form setup for the SHADOW pass only (no clip stage there)
    os.environ["RENDERER_TRI_PLANES"] = "shadow"
    res["triplanes_shadow"] = bench(frame_fn)
    del os.environ["RENDERER_TRI_PLANES"]
    print("triplanes_shadow", res["triplanes_shadow"], flush=True)

if which in ("all", "lightyhalf"):
    # unified half-rate lighting: sun (PCF x Cook-Torrance) + IBL ambient
    # on even rows, albedo/AO detail full-rate (pbr_direct_split)
    os.environ["RENDERER_LIGHT_RES"] = "yhalf"
    res["lightyhalf"] = bench(frame_fn)
    del os.environ["RENDERER_LIGHT_RES"]
    print("lightyhalf", res["lightyhalf"], flush=True)

if which in ("all", "cubeyhalf"):
    # y-half prefiltered-radiance fetch with id-aware odd-row reconstruct
    # (halves the 2M-index cube gather + copy/blend; BRDF stays per-pixel)
    os.environ["RENDERER_CUBE_RES"] = "yhalf"
    res["cubeyhalf"] = bench(frame_fn)
    del os.environ["RENDERER_CUBE_RES"]
    print("cubeyhalf", res["cubeyhalf"], flush=True)

if which in ("all", "pcf32"):
    # group=32 window table: 32k rows x 102-lane halo rows (row-count
    # halves again vs g16; lanes still under 128)
    os.environ["RENDERER_PCF_GROUP"] = "32"
    res["pcf32"] = bench(frame_fn)
    del os.environ["RENDERER_PCF_GROUP"]
    print("pcf32", res["pcf32"], flush=True)

if which in ("all", "svworld"):
    # shadow vertex stage reuses the forward pass's world positions
    os.environ["RENDERER_SHADOW_VSTAGE"] = "world"
    res["svworld"] = bench(frame_fn)
    del os.environ["RENDERER_SHADOW_VSTAGE"]
    print("svworld", res["svworld"], flush=True)

if which in ("all", "geomsoa"):
    os.environ["RENDERER_GEOM"] = "soa"
    res["geomsoa"] = bench(frame_fn)
    del os.environ["RENDERER_GEOM"]
    print("geomsoa", res["geomsoa"], flush=True)

if which in ("all", "geomaos"):
    # pre-2026-08-19 default: AoS [t,3,K] defer-table build (the column
    # stack the compiler update pessimized)
    os.environ["RENDERER_GEOM"] = "0"
    res["geomaos"] = bench(frame_fn)
    del os.environ["RENDERER_GEOM"]
    print("geomaos", res["geomaos"], flush=True)

if which in ("all", "best"):
    # the expected-winner combo: measure interactions, not just singles
    os.environ["RENDERER_DEFER_MATMUL"] = "1"
    os.environ["RENDERER_DEFER_TBL"] = "einsum"
    os.environ["RENDERER_KTBL"] = "block"
    res["best"] = bench(frame_fn)
    os.environ["RENDERER_DEFER_DTYPE"] = "bf16"
    res["best_bf16"] = bench(frame_fn)
    for k in ("RENDERER_DEFER_MATMUL", "RENDERER_DEFER_TBL",
              "RENDERER_KTBL", "RENDERER_DEFER_DTYPE"):
        del os.environ[k]
    print("best", res["best"], "best_bf16", res["best_bf16"], flush=True)

print(json.dumps(res))
