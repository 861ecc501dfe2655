"""Real-TPU parity: Pallas raster kernel vs the XLA binned oracle."""
import sys

sys.path.insert(0, "/root/repo/probes")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from scene_cache import get_full_scene
from renderer_rs_tpu.ops.clip import clip_triangles_near
from renderer_rs_tpu.ops.raster import gather_triangle_clip, setup_triangles
from renderer_rs_tpu.ops.raster_binned import rasterize_binned
from renderer_rs_tpu.ops.raster_pallas import rasterize_binned_pallas
from renderer_rs_tpu.renderer.passes import _binned_cap, vertex_stage
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

W, H = 640, 384  # moderate size keeps the XLA-oracle compile sane
scene, layout, kwargs = get_full_scene()
pipeline = GraphicsPipelineBuilder().build()
T = layout.num_triangles


@jax.jit
def both(s):
    vs = vertex_stage(s, layout)
    tri_clip = gather_triangle_clip(vs.clip, s.tris)
    tri_clip, clip_valid, clip_src, clip_bary = clip_triangles_near(tri_clip)
    setup = setup_triangles(tri_clip, W, H, pipeline, tri_valid=clip_valid)
    cap = _binned_cap(2 * T, H, W)
    vp = rasterize_binned_pallas(setup, H, W, pipeline)
    vx = rasterize_binned(setup, H, W, pipeline, cap=cap)
    return vp, vx


vp, vx = jax.block_until_ready(both(scene))
tid_eq = np.array_equal(np.asarray(vp.tri_id), np.asarray(vx.tri_id))
d_eq = np.array_equal(np.asarray(vp.depth), np.asarray(vx.depth))
b_eq = np.array_equal(np.asarray(vp.bary), np.asarray(vx.bary))
print("tri_id equal:", tid_eq, "depth equal:", d_eq, "bary equal:", b_eq, flush=True)
if not (tid_eq and d_eq):
    diff = (np.asarray(vp.tri_id) != np.asarray(vx.tri_id)).mean()
    print("tid mismatch frac", diff)
    sys.exit(1)
print("TPU parity OK", flush=True)
