"""Geometry-stage layout probe: is the ~6.6 ms forward geom (vertex
transform + triangle gather + near-clip + setup) paying the small-minor-dim
([V,3]/[T,3,4]/[T,3,2]) layout tax, and would a plane-major (SoA) pipeline
be materially faster?

Variants (cached textured 1080p scene, checksum outputs):
  aos      — the live path: vertex_stage + gather_triangle_clip +
             clip_triangles_near + setup_triangles
  soa      — hand-written plane pipeline: [V] plane FMAs for the vertex
             transform, 3 scalar index gathers per plane for the triangle
             gather, [T]-plane setup math (no near-clip duplication — upper
             bound on the win; compare against aos_noclip)
  aos_noclip — aos minus clip_triangles_near (the fair baseline for soa)
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/probes")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from scene_cache_tex import get_full_scene_tex
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

scene, layout, kwargs = get_full_scene_tex()
W, H = 1920, 1080
pipe = GraphicsPipelineBuilder().build()
FRAMES = int(os.environ.get("AB_FRAMES", "16"))


def bench(make):
    @jax.jit
    def f(eps):
        s = scene.replace(positions=scene.positions + eps)
        return make(s)

    out = f(jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = f(jnp.float32((i + 1) * 1e-12))
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / FRAMES * 1000.0, 2)


from renderer_rs_tpu.ops.clip import clip_triangles_near
from renderer_rs_tpu.ops.raster import gather_triangle_clip, setup_triangles
from renderer_rs_tpu.renderer.passes import vertex_stage

res = {}
which = sys.argv[1:] or ["all"]
want = lambda k: "all" in which or k in which

if want("aos"):
    def f(s):
        vs = vertex_stage(s, layout)
        tri_clip = gather_triangle_clip(vs.clip, s.tris)
        tri_clip, valid, _, _ = clip_triangles_near(tri_clip)
        setup = setup_triangles(tri_clip, W, H, pipe, tri_valid=valid)
        return (
            setup.xy.sum() + setup.z.sum() + setup.w.sum()
            + setup.area2.sum() + setup.valid.sum()
            + vs.world_pos.sum() + vs.world_normal.sum()
            + vs.world_tangent.sum()
        )
    res["aos"] = bench(f)
    print("aos", res["aos"], flush=True)

if want("aos_noclip"):
    def f(s):
        vs = vertex_stage(s, layout)
        tri_clip = gather_triangle_clip(vs.clip, s.tris)
        setup = setup_triangles(tri_clip, W, H, pipe)
        return (
            setup.xy.sum() + setup.z.sum() + setup.w.sum()
            + setup.area2.sum() + setup.valid.sum()
            + vs.world_pos.sum() + vs.world_normal.sum()
            + vs.world_tangent.sum()
        )
    res["aos_noclip"] = bench(f)
    print("aos_noclip", res["aos_noclip"], flush=True)

if want("soa"):
    def f(s):
        vp = s.camera.view_projection
        outs = []
        # plane-major vertex stage: per-object FMAs over [Nv] planes
        cx, cy, cz, cw = [], [], [], []
        wx, wy, wz = [], [], []
        nx, ny, nz = [], [], []
        for o, (v0, nv, _, _) in enumerate(layout.object_ranges):
            px = s.positions[v0 : v0 + nv, 0]
            py = s.positions[v0 : v0 + nv, 1]
            pz = s.positions[v0 : v0 + nv, 2]
            m = s.models[o]
            wx_ = m[0, 0] * px + m[0, 1] * py + m[0, 2] * pz + m[0, 3]
            wy_ = m[1, 0] * px + m[1, 1] * py + m[1, 2] * pz + m[1, 3]
            wz_ = m[2, 0] * px + m[2, 1] * py + m[2, 2] * pz + m[2, 3]
            cx.append(vp[0, 0] * wx_ + vp[0, 1] * wy_ + vp[0, 2] * wz_ + vp[0, 3])
            cy.append(vp[1, 0] * wx_ + vp[1, 1] * wy_ + vp[1, 2] * wz_ + vp[1, 3])
            cz.append(vp[2, 0] * wx_ + vp[2, 1] * wy_ + vp[2, 2] * wz_ + vp[2, 3])
            cw.append(vp[3, 0] * wx_ + vp[3, 1] * wy_ + vp[3, 2] * wz_ + vp[3, 3])
            wx.append(wx_); wy.append(wy_); wz.append(wz_)
            nm = s.normal_mats[o]
            qx = s.normals[v0 : v0 + nv, 0]
            qy = s.normals[v0 : v0 + nv, 1]
            qz = s.normals[v0 : v0 + nv, 2]
            rx = nm[0, 0] * qx + nm[0, 1] * qy + nm[0, 2] * qz
            ry = nm[1, 0] * qx + nm[1, 1] * qy + nm[1, 2] * qz
            rz = nm[2, 0] * qx + nm[2, 1] * qy + nm[2, 2] * qz
            inv = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz + 1e-20)
            nx.append(rx * inv); ny.append(ry * inv); nz.append(rz * inv)
        cx = jnp.concatenate(cx); cy = jnp.concatenate(cy)
        cz = jnp.concatenate(cz); cw = jnp.concatenate(cw)
        wxp = jnp.concatenate(wx); wyp = jnp.concatenate(wy)
        wzp = jnp.concatenate(wz)
        nxp = jnp.concatenate(nx); nyp = jnp.concatenate(ny)
        nzp = jnp.concatenate(nz)
        # triangle gather: 3 scalar gathers per plane (12 total for clip)
        i0, i1, i2 = s.tris[:, 0], s.tris[:, 1], s.tris[:, 2]
        planes = {}
        for name, p in (("x", cx), ("y", cy), ("z", cz), ("w", cw)):
            planes[name] = (p[i0], p[i1], p[i2])
        # setup math on [T] planes (no clip): divide, viewport, area
        eps = 1e-6
        ok_w = (
            (planes["w"][0] > eps)
            & (planes["w"][1] > eps)
            & (planes["w"][2] > eps)
        )
        sxy = []
        zs = []
        for v in range(3):
            invw = 1.0 / jnp.maximum(planes["w"][v], eps)
            sx = (planes["x"][v] * invw * 0.5 + 0.5) * W
            sy = (planes["y"][v] * invw * 0.5 + 0.5) * H
            zs.append(planes["z"][v] * invw)
            sxy.append((sx, sy))
        d1x = sxy[1][0] - sxy[0][0]
        d1y = sxy[1][1] - sxy[0][1]
        d2x = sxy[2][0] - sxy[0][0]
        d2y = sxy[2][1] - sxy[0][1]
        area2 = d1x * d2y - d1y * d2x
        valid = ok_w & (area2 < 0.0) & (area2 != 0.0)
        tot = area2.sum() + valid.sum() + ok_w.sum()
        for v in range(3):
            tot = tot + sxy[v][0].sum() + sxy[v][1].sum() + zs[v].sum()
            tot = tot + planes["w"][v].sum()
        tot = tot + wxp.sum() + wyp.sum() + wzp.sum()
        tot = tot + nxp.sum() + nyp.sum() + nzp.sum()
        return tot
    res["soa"] = bench(f)
    print("soa", res["soa"], flush=True)

print(json.dumps(res))
