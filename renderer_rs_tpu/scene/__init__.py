"""scene — scene graph and camera components (≙ crates/scene).

Host-side stateful objects (Camera, controllers, Transform hierarchy) whose
outputs are device arrays: world/normal matrices and light banks that feed
the jitted frame function as pytree inputs.
"""

from renderer_rs_tpu.scene.transform import Transform  # noqa: F401
from renderer_rs_tpu.scene.camera import (  # noqa: F401
    Camera,
    FpsController,
    OrbitController,
    Projection,
)
from renderer_rs_tpu.scene.light import (  # noqa: F401
    DirectionalLight,
    LightBank,
    PointLight,
    SpotLight,
)
