"""Static gather inventory of the textured flagship frame.

Traces (does NOT compile) forward_frame at 1080p/100k on the CPU backend
and counts every `gather` in the lowered StableHLO whose output is
per-pixel-sized (>= 1M elements), with operand/table shapes and bytes
moved. Backend-independent at this level (pre-fusion), so it runs with the
TPU tunnel down. Sub-1M gathers are summarized in bulk.

Usage: python probes/hlo_gathers.py [untextured]
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from renderer_rs_tpu.app.scenes import full_scene
from renderer_rs_tpu.core.config import ensure_f32_matmuls
from renderer_rs_tpu.renderer.passes import forward_frame
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

ensure_f32_matmuls()

W, H = 1920, 1080
textured = "untextured" not in sys.argv[1:]
scene, layout, kwargs, _ = full_scene(W, H, tri_budget=100_000, textured=textured)
pipeline = GraphicsPipelineBuilder().build()


def frame(s):
    return forward_frame(
        s, layout, pipeline, kwargs["shading"], W, H,
        tonemap=kwargs.get("tonemap", "aces"),
        shadow_map_size=kwargs.get("shadow_map_size", 1024),
        shadow_params=kwargs.get("shadow_params"),
    )


print(f"tracing textured={textured} ...", flush=True)
txt = jax.jit(frame).lower(scene).as_text()
print(f"HLO chars: {len(txt)}", flush=True)

DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "i32": 4, "ui32": 4, "i8": 1,
            "ui8": 1, "i16": 2, "ui16": 2, "f64": 8, "i64": 8, "i1": 1}


def shape_of(s):
    # "1080x1920x104xbf16" -> (elements, bytes, dims)
    parts = s.split("x")
    dt = parts[-1]
    dims = [int(p) for p in parts[:-1]] if len(parts) > 1 else []
    n = 1
    for d in dims:
        n *= d
    return n, n * DT_BYTES.get(dt, 4), s


big, small_count, small_bytes = [], 0, 0
# stablehlo.gather / "gather"(%op, %idx) ... -> tensor<OUT>
for m in re.finditer(
    r'"stablehlo\.gather"\(([^)]*)\).*?tensor<([0-9a-zA-Z_x]+)>\s*$',
    txt,
    re.M,
):
    out = m.group(2)
    n, b, _ = shape_of(out)
    # operand (table) shape: first tensor<> in the line's type signature
    line = m.group(0)
    types = re.findall(r"tensor<([0-9a-zA-Z_x]+)>", line)
    tab = types[0] if types else "?"
    if n >= 1_000_000:
        big.append((b, out, tab))
    else:
        small_count += 1
        small_bytes += b

# no gathers at all means the regex missed the dialect's print form —
# fail loudly instead of reporting "covered everything"
assert big or small_count, "no stablehlo.gather matched: check the regex vs this jax version"

big.sort(reverse=True)
total = 0
print(f"\n== per-pixel gathers (output >= 1M elems): {len(big)} ==")
for b, out, tab in big:
    total += b
    print(f"  {b/1e6:8.1f} MB  out={out:<28s} table={tab}")
print(f"  total big-gather output: {total/1e6:.1f} MB")
print(f"== sub-1M gathers: {small_count}, {small_bytes/1e6:.1f} MB ==")
