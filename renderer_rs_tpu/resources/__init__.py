"""resources — asset IO and GPU-ready data (≙ crates/resources).

glTF 2.0 loading with the reference's defaulting rules, material extraction,
and the UBO pytrees that feed the jitted frame function.
"""

from renderer_rs_tpu.resources.material import Material, MaterialBank  # noqa: F401
from renderer_rs_tpu.resources.model import Mesh, Model  # noqa: F401
from renderer_rs_tpu.resources.ubo import (  # noqa: F401
    CameraUbo,
    DirectionalLightUbo,
    ObjectUbo,
    SceneUbo,
)
from renderer_rs_tpu.resources.texture import Texture, Sampler, build_mip_pyramid  # noqa: F401
