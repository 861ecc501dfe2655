"""Regenerate showcase screenshots (800x600) on the live backend."""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from renderer_rs_tpu.app.scenes import SCENES, full_scene
from renderer_rs_tpu.renderer.passes import forward_frame
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder
from renderer_rs_tpu.utils.image_io import framebuffer_to_u8, write_png

W, H = 800, 600
for name in ():
    scene, layout, kwargs, _ = SCENES[name](W, H)
    pipe = kwargs.get("pipeline") or GraphicsPipelineBuilder().build()
    out = forward_frame(
        scene, layout, pipe, kwargs["shading"], W, H,
        tonemap=kwargs.get("tonemap", "none"),
        shadow_map_size=kwargs.get("shadow_map_size", 1024),
        shadow_params=kwargs.get("shadow_params") or __import__(
            "renderer_rs_tpu.ops.shadow", fromlist=["ShadowParams"]
        ).ShadowParams(),
    )
    write_png(f"screenshots/{name}.png", framebuffer_to_u8(np.asarray(out)))
    print("wrote", name, flush=True)

# CSM variant of the full scene
scene, layout, kwargs, _ = full_scene(W, H, csm=True)
pipe = GraphicsPipelineBuilder().build()
out = forward_frame(
    scene, layout, pipe, kwargs["shading"], W, H,
    tonemap="aces", shadow_map_size=1024,
    shadow_params=kwargs["shadow_params"],
)
write_png("screenshots/full_csm.png", framebuffer_to_u8(np.asarray(out)))
print("wrote full_csm", flush=True)
