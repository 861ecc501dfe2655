"""Device-level op timeline of the textured 1080p frame (jax.profiler).

Captures a 4-frame trace and prints per-frame device time aggregated by
HLO category plus the top ops with shapes — the ground truth for where
the frame's milliseconds go (the stub/stage probes measure at coarser
granularity and can be confounded by DCE/fusion).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_trace.py
       [trace_dir]  (default /tmp/jaxtrace; reuses an existing trace when
       run with PARSE_ONLY=1)

2026-08-19 findings recorded in docs/tpu_cost_model.md: the four 2M-index
gathers cost ~3.7-4.2 ms EACH nearly independent of table rows/width
(~240 GB/s effective random-row bandwidth); plane-major layout copies
after them total ~5.6 ms; Pallas kernels 6.6 + 3.5; everything else is
sub-ms shards.
"""
import collections
import glob
import gzip
import json
import os
import sys

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"

if not os.environ.get("PARSE_ONLY"):
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/probes")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    from scene_cache_tex import get_full_scene_tex

    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    scene, layout, kwargs = get_full_scene_tex()
    pipe = GraphicsPipelineBuilder().build()
    W, H = 1920, 1080

    @jax.jit
    def f(eps):
        s = scene.replace(positions=scene.positions + eps)
        return forward_frame(
            s, layout, pipe, kwargs["shading"], W, H,
            tonemap=kwargs.get("tonemap", "aces"),
            shadow_map_size=kwargs.get("shadow_map_size", 1024),
            shadow_params=kwargs.get("shadow_params"),
        )

    f(jnp.float32(0.0)).block_until_ready()
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(4):
        out = f(jnp.float32((i + 1) * 1e-12))
    out.block_until_ready()
    jax.profiler.stop_trace()

paths = sorted(glob.glob(os.path.join(TRACE_DIR, "plugins/profile/*/*.trace.json.gz")))
assert paths, f"no trace under {TRACE_DIR}"
with gzip.open(paths[-1]) as fh:
    d = json.load(fh)
ev = d.get("traceEvents", [])
dev_pid = None
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        if "TPU" in (e["args"].get("name") or ""):
            dev_pid = e["pid"]
cat = collections.Counter()
agg = collections.Counter()
names = {}
tot = 0.0
for e in ev:
    if e.get("ph") == "X" and e.get("pid") == dev_pid and not e["name"].startswith("jit_"):
        a = e.get("args") or {}
        c = a.get("hlo_category", "?")
        cat[c] += e.get("dur", 0)
        tot += e.get("dur", 0)
        agg[e["name"]] += e.get("dur", 0)
        names.setdefault(e["name"], a.get("long_name", "")[:150])
print(f"total device ms/frame: {tot / 4e3:.2f}")
for c, dur in cat.most_common(12):
    print(f"{dur / 4e3:8.2f} ms  {c}")
print("--- top ops (ms/frame)")
for nm, dur in agg.most_common(25):
    print(f"{dur / 4e3:7.2f} {nm:26s} {names[nm]}")

# --- full source attribution (r4): every device op carries a source_stack;
# bucket by innermost repo frame and by outermost pass call site. This is
# the complete frame accounting — the r3 "unattributed tail" was just the
# un-bucketed mid-size ops (84 ops >=0.1 ms cover ~91% of the frame).
metas = {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") == dev_pid and not e["name"].startswith("jit_"):
        metas.setdefault(e["name"], e.get("args") or {})


def _src(a):
    for fr in (a.get("source_stack") or "").split("\n"):
        if "/renderer_rs_tpu/" in fr:
            return fr.strip().replace("/root/repo/renderer_rs_tpu/", "")
    return (a.get("source") or "?").replace("/root/repo/", "")


def _caller(a):
    fs = [
        f.strip().replace("/root/repo/renderer_rs_tpu/", "")
        for f in (a.get("source_stack") or "").split("\n")
        if "/renderer_rs_tpu/" in f
    ]
    return fs[-1] if fs else "?"


for title, keyfn in (("innermost source line", _src), ("pass call site", _caller)):
    buckets = collections.Counter()
    for nm, dur in agg.items():
        buckets[keyfn(metas.get(nm, {}))] += dur
    print(f"--- by {title} (>=0.15 ms/frame)")
    shown = 0
    for s, dur in buckets.most_common():
        if dur / 4e3 < 0.15:
            break
        shown += dur
        print(f"{dur / 4e3:7.2f}  {s}")
    print(f"{(tot - shown) / 4e3:7.2f}  (rest)")
