"""Golden-image tests — the visual regression harness the reference lacks
(SURVEY.md §4.6: the only reference visual check is a manual screenshot;
framebuffer arrays make automated golden comparison trivial here).

Each BASELINE config renders at a small size on the CPU backend and compares
against a checked-in PNG. Regenerate after INTENTIONAL visual changes with:

    REGEN_GOLDENS=1 python -m pytest tests/test_golden.py
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
W, H = 160, 120
REGEN = bool(os.environ.get("REGEN_GOLDENS"))


def _render(scene_name):
    from renderer_rs_tpu.app.scenes import SCENES, full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder
    from renderer_rs_tpu.utils.image_io import framebuffer_to_u8

    if scene_name == "full":
        scene, layout, kwargs, _ = full_scene(W, H, tri_budget=2000)
    elif scene_name == "full_csm":
        scene, layout, kwargs, _ = full_scene(W, H, tri_budget=2000, csm=True)
    elif scene_name == "full_textured":
        scene, layout, kwargs, _ = full_scene(
            W, H, tri_budget=2000, textured=True
        )
    elif scene_name == "full_hdr":
        # locks the whole IBL-from-file chain (load_hdr -> equirect ->
        # irradiance/prefilter/LUT -> shade + fused skybox) to pixels
        scene, layout, kwargs, _ = full_scene(
            W, H, tri_budget=2000,
            hdr=os.path.join(
                os.path.dirname(__file__), "assets", "sky_equirect_64x32.hdr"
            ),
        )
    else:
        scene, layout, kwargs, _ = SCENES[scene_name](W, H)
    pipeline = kwargs.get("pipeline") or GraphicsPipelineBuilder().build()
    frame = forward_frame(
        scene,
        layout,
        pipeline,
        kwargs["shading"],
        W,
        H,
        tonemap=kwargs.get("tonemap", "none"),
        shadow_map_size=min(kwargs.get("shadow_map_size", 256), 256),
        shadow_params=kwargs.get("shadow_params") or _default_params(),
    )
    return framebuffer_to_u8(frame)


def _default_params():
    from renderer_rs_tpu.ops.shadow import ShadowParams

    return ShadowParams()


def _check(name, img):
    path = os.path.join(GOLDEN_DIR, f"{name}_{W}x{H}.png")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        from renderer_rs_tpu.utils.image_io import write_png

        write_png(path, img)
        if not REGEN:
            pytest.skip(f"golden created: {path} (re-run to compare)")
        return
    from PIL import Image

    golden = np.asarray(Image.open(path)).astype(np.int32)
    got = np.asarray(img).astype(np.int32)
    assert golden.shape == got.shape, f"{name}: shape {got.shape} != {golden.shape}"
    diff = np.abs(golden - got)
    # tolerate tiny numeric drift (XLA version changes), fail on visual change
    assert diff.mean() < 1.0, f"{name}: mean diff {diff.mean():.3f}"
    frac_big = (diff.max(axis=-1) > 8).mean()
    assert frac_big < 0.005, f"{name}: {frac_big:.2%} pixels differ by >8"


@pytest.mark.parametrize(
    "scene",
    ["triangle", "cube", "blinnphong", "gltf-pbr", "full", "full_csm",
     "full_textured", "full_hdr"],
)
def test_golden(scene):
    _check(scene, _render(scene))


def _render_transparent():
    """Textured translucent checker quad composited over the full scene
    (VERDICT r2 item 6's golden: factor x texture x vertex alpha under the
    alpha_blend preset, painter's sort intact)."""
    import math

    import jax.numpy as jnp

    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.mathx import quat_from_axis_angle
    from renderer_rs_tpu.ops.tonemap import apply_tonemap
    from renderer_rs_tpu.renderer.passes import forward_frame, transparent_pass
    from renderer_rs_tpu.renderer.scene_build import SceneBuilder
    from renderer_rs_tpu.resources.material import Material
    from renderer_rs_tpu.resources.ubo import SceneUbo
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder
    from renderer_rs_tpu.scene.transform import Transform
    from renderer_rs_tpu.utils import meshgen
    from renderer_rs_tpu.utils.image_io import framebuffer_to_u8

    scene, layout, kwargs, _ = full_scene(W, H, tri_budget=2000)
    pipeline = GraphicsPipelineBuilder().build()
    color, depth = forward_frame(
        scene, layout, pipeline, kwargs["shading"], W, H,
        tonemap="none",
        shadow_map_size=256,
        shadow_params=kwargs.get("shadow_params") or _default_params(),
        return_depth=True,
    )

    trans = SceneBuilder()
    trans.set_textures([meshgen.checkerboard_image(64, squares=4)], size=64)
    trans.add_mesh(
        meshgen.plane_mesh(2.4, uv_scale=1.0),
        Transform()
        .with_position([0.0, 1.2, 1.2])
        .with_rotation(
            np.asarray(
                quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), math.pi / 2)
            )
        ),
        Material(
            base_color=(1.0, 0.6, 0.3, 0.55), roughness=0.4, base_color_texture=0
        ),
    )
    trans.set_camera(scene.camera)
    trans.set_scene_ubo(SceneUbo.create(ambient_color=(1.0, 1.0, 1.0)))
    t_scene, t_layout = trans.build()
    out = transparent_pass(
        color, depth, t_scene, t_layout, pipeline, W, H
    )
    return framebuffer_to_u8(apply_tonemap(out, "aces"))


def test_golden_transparent():
    _check("transparent", _render_transparent())
