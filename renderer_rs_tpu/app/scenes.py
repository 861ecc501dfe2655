"""Demo scene factories matching BASELINE.json's five staged configs:

0. triangle    — Hello Triangle, clip-space flat interp (Phase-1 demo)
1. cube        — spinning textured cube, depth buffer, bilinear sampling
2. blinnphong  — per-pixel Blinn-Phong mesh with 4 point lights
3. gltf-pbr    — metallic-roughness PBR, multiple draws from the scene graph
               (loads a .gltf if given, else a procedural multi-object scene)
4. full        — shadow-mapped sun + environment skybox + tonemap

Each factory returns (scene, layout, renderer_kwargs, animate_fn) where
animate_fn(scene, t, dt) -> scene updates the dynamic pytree per frame.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from renderer_rs_tpu.mathx import quat_from_axis_angle
from renderer_rs_tpu.ops.shadow import directional_light_matrix
from renderer_rs_tpu.renderer.passes import ShadingModel
from renderer_rs_tpu.renderer.scene_build import Environment, SceneBuilder
from renderer_rs_tpu.resources.material import Material
from renderer_rs_tpu.resources.ubo import CameraUbo, SceneUbo
from renderer_rs_tpu.rhi.command import CommandBuffer
from renderer_rs_tpu.rhi.pipeline import CullMode, GraphicsPipelineBuilder
from renderer_rs_tpu.scene.camera import Camera, Projection
from renderer_rs_tpu.scene.light import DirectionalLight, LightBank, PointLight
from renderer_rs_tpu.scene.transform import Transform
from renderer_rs_tpu.utils import meshgen


def _camera_ubo(cam: Camera) -> CameraUbo:
    return CameraUbo.create(cam.view_matrix(), cam.projection_matrix(), cam.position)


def _orbit_camera(width, height, distance=3.0, height_y=1.5, fov=60.0) -> Camera:
    cam = Camera(Projection.perspective(math.radians(fov), width / height, 0.1, 100.0))
    cam.position = np.array([0.0, height_y, distance], np.float32)
    cam.look_at([0.0, 0.0, 0.0])
    return cam


def triangle_scene(width: int, height: int):
    """Config 0 (≙ renderer.rs:205-260): no culling, no depth, flat interp.

    Scene construction records through the CommandBuffer (begin -> bind
    pipeline -> draw -> end -> build_scene), the documented lowering of the
    reference's command recording (record_commands, renderer.rs:452-557)."""
    pipeline = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_test_enable(False)
        .depth_write_enable(False)
        .depth_attachment_format(None)
        .build()
    )
    cb = CommandBuffer().begin().bind_pipeline(pipeline).set_viewport(width, height)
    cb.draw_mesh(meshgen.triangle_mesh())
    cb.end()
    scene, layout, pipeline = cb.build_scene()
    kwargs = dict(pipeline=pipeline, shading=ShadingModel.FLAT)
    return scene, layout, kwargs, None


def cube_scene(width: int, height: int):
    """Config 1: spinning textured cube."""
    pipeline = GraphicsPipelineBuilder().build()
    cb = CommandBuffer().begin().bind_pipeline(pipeline).set_viewport(width, height)
    mat = Material(base_color=(1, 1, 1, 1), roughness=0.6, base_color_texture=0)
    cb.draw_mesh(meshgen.cube_mesh(), Transform(), mat)
    cb.end()
    builder = SceneBuilder()
    builder.set_textures([meshgen.checkerboard_image(256)])
    cam = _orbit_camera(width, height, distance=2.2, height_y=1.4)
    builder.set_camera(_camera_ubo(cam))
    builder.set_lights(
        LightBank.create(sun=DirectionalLight.create(direction=(-0.5, -1.0, -0.3)))
    )
    builder.set_scene_ubo(SceneUbo.create(ambient_color=(0.08, 0.08, 0.08)))
    scene, layout, pipeline = cb.build_scene(builder)
    kwargs = dict(pipeline=pipeline, shading=ShadingModel.BLINN_PHONG, camera=cam)

    def animate(scene, t, dt):
        rot = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), t)
        tr = Transform().with_rotation(np.asarray(rot))
        models = scene.models.at[0].set(jnp.asarray(tr.world_matrix()))
        nmats = scene.normal_mats.at[0].set(jnp.asarray(tr.normal_matrix()))
        ubo = scene.scene_ubo.update_time(t, dt)
        return scene.replace(models=models, normal_mats=nmats, scene_ubo=ubo)

    return scene, layout, kwargs, animate


def blinnphong_scene(width: int, height: int, rings=32, sectors=48):
    """Config 2: Blinn-Phong sphere ("Suzanne-class" mesh) + 4 point lights."""
    pipeline = GraphicsPipelineBuilder().build()
    cb = CommandBuffer().begin().bind_pipeline(pipeline).set_viewport(width, height)
    cb.draw_mesh(
        meshgen.uv_sphere_mesh(0.9, rings, sectors),
        Transform(),
        Material(base_color=(0.8, 0.3, 0.2, 1.0), roughness=0.35),
    )
    cb.draw_mesh(
        meshgen.plane_mesh(8.0),
        Transform().with_position([0.0, -1.0, 0.0]),
        Material(base_color=(0.6, 0.6, 0.65, 1.0), roughness=0.8),
    )
    cb.end()
    builder = SceneBuilder()
    cam = _orbit_camera(width, height, distance=3.2, height_y=1.6)
    builder.set_camera(_camera_ubo(cam))
    colors = [(1, 0.9, 0.8), (0.3, 0.5, 1.0), (0.4, 1.0, 0.4), (1.0, 0.3, 0.6)]
    pts = [
        PointLight.create(
            position=(2.2 * math.cos(a), 1.5, 2.2 * math.sin(a)),
            color=c,
            intensity=3.0,
            radius=12.0,
        )
        for a, c in zip((0.0, math.pi / 2, math.pi, 3 * math.pi / 2), colors)
    ]
    builder.set_lights(
        LightBank.create(
            sun=DirectionalLight.create(direction=(-0.4, -1.0, -0.2), intensity=0.4),
            points=pts,
        )
    )
    builder.set_scene_ubo(SceneUbo.create(ambient_color=(0.03, 0.03, 0.04)))
    scene, layout, pipeline = cb.build_scene(builder)
    kwargs = dict(pipeline=pipeline, shading=ShadingModel.BLINN_PHONG, camera=cam)

    def animate(scene, t, dt):
        # lights orbit the sphere
        pp = scene.lights.point_position
        for i, a0 in enumerate((0.0, math.pi / 2, math.pi, 3 * math.pi / 2)):
            a = a0 + t
            pp = pp.at[i].set(
                jnp.array([2.2 * math.cos(a), 1.5, 2.2 * math.sin(a)], jnp.float32)
            )
        return scene.replace(lights=scene.lights.replace(point_position=pp))

    return scene, layout, kwargs, animate


def gltf_pbr_scene(width: int, height: int, gltf_path: str | None = None):
    """Config 3: PBR scene — a .gltf model if provided, else a procedural
    multi-draw scene-graph arrangement (metal/rough sphere grid + floor)."""
    pipeline = GraphicsPipelineBuilder().build()
    cb = CommandBuffer().begin().bind_pipeline(pipeline).set_viewport(width, height)
    builder = SceneBuilder()
    if gltf_path:
        from renderer_rs_tpu.resources.model import Model

        model = Model.load(gltf_path)
        root = Transform()
        scale = 2.0 / max(model.diagonal(), 1e-6)
        root.with_scale([scale] * 3).with_position(
            (-model.center() * scale).tolist()
        )
        cb.draw_model(model, root)
    else:
        n = 4
        for i in range(n):
            for j in range(n):
                mat = Material(
                    base_color=(0.9, 0.2, 0.15, 1.0),
                    metallic=i / (n - 1),
                    roughness=max(j / (n - 1), 0.05),
                )
                # parented transforms exercise the scene graph (config 3:
                # "multiple draws from crates/scene graph")
                root = Transform().with_position([0.0, 0.0, 0.0])
                child = (
                    Transform()
                    .with_position(
                        [(i - (n - 1) / 2) * 1.2, 0.4, (j - (n - 1) / 2) * 1.2]
                    )
                    .with_scale([0.45, 0.45, 0.45])
                    .with_parent(root)
                )
                cb.draw_mesh(meshgen.uv_sphere_mesh(1.0, 16, 24), child, mat)
        cb.draw_mesh(
            meshgen.plane_mesh(10.0),
            Transform().with_position([0.0, 0.0, 0.0]),
            Material(base_color=(0.5, 0.5, 0.55, 1.0), roughness=0.9),
        )
    cb.end()
    cam = _orbit_camera(width, height, distance=4.2, height_y=2.8, fov=50.0)
    builder.set_camera(_camera_ubo(cam))
    builder.set_lights(
        LightBank.create(
            sun=DirectionalLight.create(direction=(-0.5, -1.0, -0.4), intensity=3.0)
        )
    )
    scene, layout, pipeline = cb.build_scene(builder)
    kwargs = dict(pipeline=pipeline, shading=ShadingModel.PBR, camera=cam)
    return scene, layout, kwargs, None


def full_scene(
    width: int,
    height: int,
    tri_budget: int = 100_000,
    ibl: bool = True,
    csm: bool = False,
    textured: bool = False,
    hdr: str | None = None,
    gltf: str | None = None,
):
    """Config 4: shadow-mapped sun + HDR environment IBL + skybox + ACES
    tonemap at a given triangle budget (default 100k, the north-star
    workload). ibl=True runs the one-time IBL precompute chain (irradiance
    convolution, GGX prefilter, BRDF LUT) over the procedural HDR sky.

    textured=True binds a full 5-slot 256² PBR texture set (procedural
    base/normal/MR/AO/emissive, meshgen.procedural_pbr_textures) to every
    material — the BASELINE.json configs[4] "textured PBR glTF scene"
    workload the headline bench must measure (VERDICT r2 item 2).

    gltf: replace the sphere grid with a real glTF model instanced up to
    ~tri_budget (one Model.load; instances share its decoded texture set
    and material table via SceneBuilder.add_model reuse). The model's own
    textures bind through the regular glTF pipeline — e.g. the reference's
    dancer asset (17.2k tris, real normal map; base/MR stripped to 1x1
    white by .MISSING_LARGE_BLOBS) instanced 6x = a ~103k-tri true-glTF
    full-frame workload. `textured` is ignored for the model draws (the
    asset's texture table wins); the floor keeps its procedural set."""
    from renderer_rs_tpu.ops.ibl import (
        brdf_lut,
        irradiance_map,
        prefilter_map,
        procedural_sky_cubemap,
    )
    from renderer_rs_tpu.resources.texture import CubeMap

    # sphere subdivision hitting ~tri_budget across the grid + floor:
    # tris/sphere = 2*rings*sectors = 4*rings^2 (sectors = 2*rings)
    n = 3
    per_sphere = max(tri_budget // (n * n), 32)
    rings = max(int(math.sqrt(per_sphere / 4)), 4)
    sectors = 2 * rings

    pipeline = GraphicsPipelineBuilder().build()
    cb = CommandBuffer().begin().bind_pipeline(pipeline).set_viewport(width, height)
    builder = SceneBuilder()
    tex_kw = {}
    gltf_textured = bool(gltf) and textured
    if gltf:
        # the model's own texture table binds through add_model; an explicit
        # set_textures would shadow it (build() only auto-assembles the
        # accumulated model images when set_textures was NOT called).
        # textured=True becomes the textured-override below: degenerate
        # stripped model images are replaced with the procedural maps.
        textured = False
    if textured:
        # one shared 5-slot set; per-material FACTORS still vary across the
        # grid (texture x factor, model_pbr.hlsl:205-245 semantics)
        maps = meshgen.procedural_pbr_textures(256)
        builder.set_textures(
            [
                maps["base_color"], maps["normal"], maps["metallic_roughness"],
                maps["occlusion"], maps["emissive"],
            ]
        )
        tex_kw = dict(
            base_color_texture=0,
            normal_texture=1,
            metallic_roughness_texture=2,
            occlusion_texture=3,
            emissive_texture=4,
            emissive=(1.0, 1.0, 1.0, 0.0),  # emissive factor gates the map
        )
    if gltf:
        from renderer_rs_tpu.resources.model import Model

        model = Model.load(gltf)
        if gltf_textured:
            # textured-override (VERDICT r3 Missing 4): the snapshot strips
            # the dancer's base/MR maps to 1x1 white
            # (/root/reference/.MISSING_LARGE_BLOBS:2-3), which makes the
            # true-glTF bench sample near-degenerate atlases for those
            # slots. Substitute DEGENERATE (<=2px) model images with the
            # procedural 256^2 maps of the matching slot so the glTF
            # workload carries full texture-fetch cost; real images are
            # kept untouched.
            maps = meshgen.procedural_pbr_textures(256)
            # Per (material, slot): a DEGENERATE texture is replaced by the
            # procedural map of THAT slot. A stripped image shared by two
            # slots gets one dedicated replacement per slot (appended to
            # the model's table and the material repointed) — substituting
            # a single shared index would feed one slot the wrong map.
            repl: dict = {}  # slot name -> texture index of its replacement
            for m in model.materials or []:
                for attr, name in (
                    ("base_color_texture", "base_color"),
                    ("normal_texture", "normal"),
                    ("metallic_roughness_texture", "metallic_roughness"),
                    ("occlusion_texture", "occlusion"),
                    ("emissive_texture", "emissive"),
                ):
                    ti = getattr(m, attr)
                    if (
                        ti is None
                        or ti < 0
                        or ti >= len(model.textures)
                        or max(model.textures[ti].shape[:2]) > 2
                    ):
                        continue
                    if name not in repl:
                        model.textures.append(
                            np.asarray(maps[name], np.float32)
                        )
                        repl[name] = len(model.textures) - 1
                    setattr(m, attr, repl[name])
        n_inst = max(1, round(tri_budget / max(model.total_triangle_count(), 1)))
        scale = 2.4 / max(model.diagonal(), 1e-6)
        # feet on the floor: AABB min.y maps to y=0 (the plane)
        foot_y = -float(model.aabb_min[1]) * scale
        cols = max(1, int(math.ceil(math.sqrt(n_inst))))
        for k in range(n_inst):
            i, j = k % cols, k // cols
            rows_n = (n_inst + cols - 1) // cols
            tr = (
                Transform()
                .with_position(
                    [
                        (i - (cols - 1) / 2) * 1.6,
                        foot_y,
                        (j - (rows_n - 1) / 2) * 1.6,
                    ]
                )
                .with_rotation(
                    np.asarray(
                        quat_from_axis_angle(
                            jnp.array([0.0, 1.0, 0.0]), 0.7 * k
                        )
                    )
                )
                .with_scale([scale] * 3)
            )
            cb.draw_model(model, tr)
    else:
        for i in range(n):
            for j in range(n):
                mat = Material(
                    base_color=(0.85, 0.3, 0.2, 1.0),
                    metallic=i / max(n - 1, 1),
                    roughness=max(j / max(n - 1, 1), 0.08),
                    **tex_kw,
                )
                tr = (
                    Transform()
                    .with_position(
                        [(i - (n - 1) / 2) * 1.6, 0.6, (j - (n - 1) / 2) * 1.6]
                    )
                    .with_scale([0.6, 0.6, 0.6])
                )
                cb.draw_mesh(meshgen.uv_sphere_mesh(1.0, rings, sectors), tr, mat)
    cb.draw_mesh(
        meshgen.plane_mesh(12.0),
        Transform(),
        Material(base_color=(0.55, 0.55, 0.6, 1.0), roughness=0.85, **tex_kw),
    )
    cb.end()
    cam = _orbit_camera(width, height, distance=5.0, height_y=3.0, fov=50.0)
    builder.set_camera(_camera_ubo(cam))
    sun_dir = np.array([-0.45, -1.0, -0.35], np.float32)
    builder.set_lights(
        LightBank.create(sun=DirectionalLight.create(direction=sun_dir, intensity=3.5))
    )
    if csm:
        # 4-cascade sun shadows fitted to the camera frustum (ops/csm.py)
        from renderer_rs_tpu.ops.csm import fit_cascades

        mats, splits = fit_cascades(cam, sun_dir)
        builder.set_csm(mats, splits)
    else:
        # ortho box fitted to the shadow CASTERS (sphere grid extent ~2.2
        # + radius margin): a loose box wastes map resolution AND
        # concentrates raster bins (measured 9x-average peaks at r=7)
        builder.set_shadow_matrix(
            directional_light_matrix(jnp.asarray(sun_dir), jnp.zeros(3), 3.5)
        )
    import jax as _jax

    if ibl:
        # the one-time precompute chain (≙ the reference's compute shader
        # dispatches, SURVEY.md §2.8) as ONE jitted program: eager op-by-op
        # execution pays the remote-compile hop per op on the TPU backend
        # (CLAUDE.md gotchas) — a single cached executable does not.
        # A real Radiance .hdr equirect (the reference's stripped
        # brown_photostudio asset class, .MISSING_LARGE_BLOBS:1) feeds
        # equirect_to_cubemap; otherwise the procedural sky stands in.
        equirect = None
        if hdr is not None:
            from renderer_rs_tpu.resources.hdr import load_hdr

            # load_hdr returns the standard orientation (row 0 = zenith);
            # equirect_to_cubemap keeps the reference's exact UV math
            # (equirect_to_cubemap.hlsl:59-76: up -> v=1 -> LAST row), so
            # flip rows here to feed it the convention it samples.
            equirect = jnp.asarray(load_hdr(hdr)[::-1])

        @_jax.jit
        def _build_env():
            if equirect is not None:
                from renderer_rs_tpu.ops.ibl import equirect_to_cubemap

                sky = equirect_to_cubemap(equirect, 64)
            else:
                sky = procedural_sky_cubemap(64, sun_direction=tuple(sun_dir))
            sky_mips = CubeMap.from_faces(sky, generate_mips=True).mips
            return (
                sky,
                irradiance_map(sky, size=16),
                prefilter_map(sky_mips, base_size=32, levels=5, samples=32),
                brdf_lut(64, samples=256, chunk=64),
            )

        sky, irr, pref, lut = _build_env()
        env = Environment(
            skybox_mips=(sky,),
            irradiance_mips=(irr,),
            prefiltered_mips=pref,
            brdf_lut=lut,
        )
    else:
        sky = _jax.jit(
            lambda: procedural_sky_cubemap(64, sun_direction=tuple(sun_dir))
        )()
        env = Environment(skybox_mips=(sky,))
    builder.set_environment(env)
    scene, layout, pipeline = cb.build_scene(builder)
    from renderer_rs_tpu.ops.shadow import ShadowParams

    # bias scaled to the shadow texel world size (ortho box 14 units / 1024)
    kwargs = dict(
        pipeline=pipeline,
        shading=ShadingModel.PBR_IBL if ibl else ShadingModel.PBR,
        camera=cam,
        tonemap="aces",
        shadow_map_size=1024,
        shadow_params=ShadowParams(shadow_bias=0.012, normal_bias=0.06),
    )
    return scene, layout, kwargs, None


SCENES = {
    "triangle": triangle_scene,
    "cube": cube_scene,
    "blinnphong": blinnphong_scene,
    "gltf-pbr": gltf_pbr_scene,
    "full": full_scene,
}
