"""Regenerate showcase screenshots (800x600) on the live backend.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python probes/shots.py [names]
Env: SHOTS_TRIS=N (full-scene budget, default 100000), SHOTS_BACKEND=cpu
(force CPU when the TPU tunnel is down — same program, same pixels).
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("SHOTS_BACKEND"):
    jax.config.update("jax_platforms", os.environ["SHOTS_BACKEND"])

import numpy as np

from renderer_rs_tpu.app.scenes import SCENES, full_scene
from renderer_rs_tpu.core.config import ensure_f32_matmuls
from renderer_rs_tpu.ops.shadow import ShadowParams
from renderer_rs_tpu.renderer.passes import forward_frame
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder
from renderer_rs_tpu.utils.image_io import framebuffer_to_u8, write_png

ensure_f32_matmuls()

W, H = 800, 600
TRIS = int(os.environ.get("SHOTS_TRIS", "100000"))
HDR = "tests/assets/sky_equirect_64x32.hdr"

CONFIGS = {
    # the five BASELINE.json staged configs + the r3 showcase variants
    "triangle": lambda: SCENES["triangle"](W, H),
    "cube": lambda: SCENES["cube"](W, H),
    "blinnphong": lambda: SCENES["blinnphong"](W, H),
    "gltf-pbr": lambda: SCENES["gltf-pbr"](W, H),
    "full": lambda: full_scene(W, H, tri_budget=TRIS),
    "full_csm": lambda: full_scene(W, H, tri_budget=TRIS, csm=True),
    "full_textured": lambda: full_scene(W, H, tri_budget=TRIS, textured=True),
    "full_hdr": lambda: full_scene(W, H, tri_budget=TRIS, hdr=HDR),
    # textured=True applies the textured-override: the snapshot's stripped
    # 1x1 base/MR maps substitute procedural 256^2 maps (bench parity)
    "full_gltf": lambda: full_scene(
        W, H, tri_budget=TRIS, textured=True,
        gltf="/root/reference/assets/models/a_contortionist_dancer/scene.gltf",
    ),
}

names = sys.argv[1:] or list(CONFIGS)
for name in names:
    scene, layout, kwargs, _ = CONFIGS[name]()
    pipe = kwargs.get("pipeline") or GraphicsPipelineBuilder().build()
    out = forward_frame(
        scene, layout, pipe, kwargs["shading"], W, H,
        tonemap=kwargs.get("tonemap", "none"),
        shadow_map_size=kwargs.get("shadow_map_size", 1024),
        shadow_params=kwargs.get("shadow_params") or ShadowParams(),
    )
    write_png(f"screenshots/{name}.png", framebuffer_to_u8(np.asarray(out)))
    print("wrote", name, flush=True)
