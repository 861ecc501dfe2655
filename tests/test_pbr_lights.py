"""PBR point/spot light loops end-to-end (pixel/model_pbr.hlsl:302-345):
the masked fixed-trip loops add only the first num_point/num_spot lights."""

import math

import numpy as np

from renderer_rs_tpu.app.scenes import _camera_ubo
from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
from renderer_rs_tpu.renderer.scene_build import SceneBuilder
from renderer_rs_tpu.resources.material import Material
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder
from renderer_rs_tpu.scene.camera import Camera, Projection
from renderer_rs_tpu.scene.light import (
    DirectionalLight,
    LightBank,
    PointLight,
    SpotLight,
)
from renderer_rs_tpu.utils import meshgen

W, H = 96, 72


def _scene(points=(), spots=(), max_point=None, max_spot=None):
    b = SceneBuilder()
    b.add_mesh(
        meshgen.plane_mesh(6.0),
        material=Material(base_color=(0.8, 0.8, 0.8, 1.0), roughness=0.4),
    )
    cam = Camera(Projection.perspective(math.radians(60), W / H, 0.1, 50.0))
    cam.position = np.array([0.0, 2.5, 3.0], np.float32)
    cam.look_at([0.0, 0.0, 0.0])
    b.set_camera(_camera_ubo(cam))
    b.set_lights(
        LightBank.create(
            sun=DirectionalLight.create(direction=(0, -1, 0), intensity=0.0),
            points=list(points),
            spots=list(spots),
            max_point=max_point,
            max_spot=max_spot,
        )
    )
    return b.build()


def _render(scene, layout):
    pipe = GraphicsPipelineBuilder().build()
    return np.asarray(
        forward_frame(scene, layout, pipe, ShadingModel.PBR, W, H)
    )


def test_point_light_illuminates_pbr():
    dark_s, dark_l = _scene()
    lit_s, lit_l = _scene(
        points=[PointLight.create(position=(0, 1.5, 0), intensity=6.0, radius=10.0)]
    )
    dark = _render(dark_s, dark_l)
    lit = _render(lit_s, lit_l)
    c = H // 2, W // 2
    assert lit[c][0] > dark[c][0] + 0.05  # point light adds radiance


def test_spot_light_cone_limits_pbr():
    lit_s, lit_l = _scene(
        spots=[
            SpotLight.create(
                position=(0, 2.0, 0),
                direction=(0, -1, 0),
                intensity=12.0,
                inner_cutoff=0.984807753012208,
                outer_cutoff=0.9612616959383189,
            )
        ]
    )
    img = _render(lit_s, lit_l)
    dark_s, dark_l = _scene()
    dark = _render(dark_s, dark_l)
    delta = img[..., 0] - dark[..., 0]
    # the cone lights a compact central spot, not the whole floor
    assert delta.max() > 0.05
    lit_frac = (delta > 0.02).mean()
    assert 0.0 < lit_frac < 0.3


def test_masked_light_count():
    """Bank slots beyond num_point contribute nothing (model_pbr.hlsl's
    numPointLights loop bound as a masked fixed-trip loop)."""
    one_s, one_l = _scene(
        points=[PointLight.create(position=(0, 1.5, 0), intensity=6.0, radius=10.0)],
        max_point=3,  # padded bank: 2 zero slots beyond num_point
    )
    img_pad = _render(one_s, one_l)
    one2_s, one2_l = _scene(
        points=[PointLight.create(position=(0, 1.5, 0), intensity=6.0, radius=10.0)]
    )
    img_tight = _render(one2_s, one2_l)
    np.testing.assert_allclose(img_pad, img_tight, atol=1e-6)
