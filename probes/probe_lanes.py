"""Lane/row calibration microprobe: separates the three cost hypotheses
for per-pixel [2M, L] work on TPU —

  (a) elementwise cost linear in L (the 0.16 ms/lane model),
  (b) elementwise cost FLAT in L because minor dims pad to 128 lanes,
  (c) gather cost = f(table rows) + g(output lanes).

Measures, at 2M pixels (1080p):
  ew_L<k>      — one fused elementwise+reduce pass over [2M, k] f32
                 (compare+select+sum, the halo_window_reduce op mix)
  mimic30      — exact halo_window_reduce op structure at L=30
  ga_r<R>_L<k> — [2M] row gather from an [R, k] f32 table + 1-pass reduce

eps-perturbed indices defeat the tunnel's identical-dispatch cache.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

H, W = 1080, 1920
N = H * W
rng = np.random.default_rng(0)
cur = jnp.asarray(rng.random((H, W), np.float32))
FRAMES = 12


def bench(fn, *args):
    @jax.jit
    def f(eps, *a):
        return fn(eps, *a)

    out = f(jnp.float32(0.0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = f(jnp.float32((i + 1) * 1e-9), *args)
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / FRAMES * 1000.0, 2)


res = {}
which = sys.argv[1] if len(sys.argv) > 1 else "all"


def want(k):
    return which in ("all", k)


# --- elementwise vs lane count ------------------------------------------------
# arrays ride as jit ARGUMENTS: closure constants embed in the remote-compile
# HTTP body and 413 past ~100 MB
if want("ew"):
    for L in (8, 30, 104, 128):
        x = jnp.asarray(rng.random((H, W, L), np.float32))

        def ew(eps, x):
            # barrier ≙ the gather materialization boundary in the real path
            (xx,) = jax.lax.optimization_barrier((x + eps,))
            cmp = (xx >= cur[..., None]) & (xx < 0.97)
            return jnp.sum(cmp.astype(jnp.float32), axis=-1)

        res[f"ew_L{L}"] = bench(ew, x)
        print(f"ew_L{L}", res[f"ew_L{L}"], flush=True)

# --- the exact halo reduce mix at L=30 ---------------------------------------
if want("mimic30"):
    from renderer_rs_tpu.ops.shadow import halo_window_reduce

    x = jnp.asarray(rng.random((H, W, 30), np.float32))
    sub = jnp.asarray(rng.integers(0, 8, (H, W)), jnp.int32)

    def mimic(eps, x, sub):
        (xx,) = jax.lax.optimization_barrier((x + eps,))
        return halo_window_reduce(xx, sub, cur, 8)

    res["mimic30"] = bench(mimic, x, sub)
    print("mimic30", res["mimic30"], flush=True)

# --- plane-major layout: the same compare+reduce as ew_L30 but with the
# channel dim LEADING ([30, H, W] -> 30 full-lane-utilization planes).
# If this is several x cheaper than ew_L30, minor-dim lane padding (30->128)
# is the elementwise tax and reduce stages should go plane-major.
if want("ew_planes"):
    xp = jnp.asarray(rng.random((30, H, W), np.float32))

    def ewp(eps, xp):
        (xx,) = jax.lax.optimization_barrier((xp + eps,))
        cmp = (xx >= cur[None]) & (xx < 0.97)
        return jnp.sum(cmp.astype(jnp.float32), axis=0)

    res["ew_planes30"] = bench(ewp, xp)
    print("ew_planes30", res["ew_planes30"], flush=True)

# --- pure lookup floor: scalar-payload gather (no lane dim at all) -------------
if want("ga_scalar"):
    R = 131072
    tab1 = jnp.asarray(rng.random((R,), np.float32))
    idx0 = jnp.asarray(rng.integers(0, R, (H, W)), jnp.int32)

    def gs(eps, tab1, idx0):
        idx = jnp.minimum(idx0 + eps.astype(jnp.int32), R - 1)
        (g,) = jax.lax.optimization_barrier((tab1[idx],))
        return g

    res["ga_scalar_r131072"] = bench(gs, tab1, idx0)
    print("ga_scalar_r131072", res["ga_scalar_r131072"], flush=True)

# --- lookup-count scaling: quarter-rate lookups (960x540) ----------------------
if want("ga_quarter"):
    R, L = 131072, 30
    tab = jnp.asarray(rng.random((R, L), np.float32))
    idxq = jnp.asarray(rng.integers(0, R, (H // 2, W // 2)), jnp.int32)

    def gq(eps, tab, idxq, R=R):
        idx = jnp.minimum(idxq + eps.astype(jnp.int32), R - 1)
        (g,) = jax.lax.optimization_barrier((tab[idx],))
        return g.sum(-1)

    res["ga_quarter_r131072_L30"] = bench(gq, tab, idxq)
    print("ga_quarter_r131072_L30", res["ga_quarter_r131072_L30"], flush=True)

# --- lane-count cost curve at full 2M lookup rate ------------------------------
if want("ga_lanes"):
    R = 131072
    idx0 = jnp.asarray(rng.integers(0, R, (H, W)), jnp.int32)
    for L in (2, 4, 8, 16):
        tab = jnp.asarray(rng.random((R, L), np.float32))

        def ga(eps, tab, idx0, R=R):
            idx = jnp.minimum(idx0 + eps.astype(jnp.int32), R - 1)
            (g,) = jax.lax.optimization_barrier((tab[idx],))
            return g.sum(-1)

        res[f"ga_r{R}_L{L}"] = bench(ga, tab, idx0)
        print(f"ga_r{R}_L{L}", res[f"ga_r{R}_L{L}"], flush=True)

# --- scalar gather from a 1M-row table (the flat shadow map) --------------------
if want("ga_scalar1m"):
    R = 1048576
    tab1 = jnp.asarray(rng.random((R,), np.float32))
    idx0 = jnp.asarray(rng.integers(0, R, (H, W)), jnp.int32)

    def gs(eps, tab1, idx0):
        idx = jnp.minimum(idx0 + eps.astype(jnp.int32), R - 1)
        (g,) = jax.lax.optimization_barrier((tab1[idx],))
        return g

    res["ga_scalar_r1M"] = bench(gs, tab1, idx0)
    print("ga_scalar_r1M", res["ga_scalar_r1M"], flush=True)

# --- the 9-scalar-tap PCF pattern: 9 clamped 2D taps from a 1024^2 map ----------
if want("pcf9"):
    S = 1024
    smap = jnp.asarray(rng.random((S, S), np.float32))
    ixy = jnp.asarray(rng.integers(0, S, (2, H, W)), jnp.int32)

    def p9(eps, smap, ixy):
        flat = smap.reshape(-1)
        ix = jnp.minimum(ixy[0] + eps.astype(jnp.int32), S - 1)
        iy = ixy[1]
        acc = jnp.zeros((H, W), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                sx = jnp.clip(ix + dx, 0, S - 1)
                sy = jnp.clip(iy + dy, 0, S - 1)
                acc = acc + (flat[sy * S + sx] >= cur).astype(jnp.float32)
        return acc * (1.0 / 9.0)

    res["pcf9_scalar"] = bench(p9, smap, ixy)
    print("pcf9_scalar", res["pcf9_scalar"], flush=True)

# --- gather: rows x lanes grid ------------------------------------------------
if want("ga"):
    for R, L in ((131072, 30), (262144, 30), (1048576, 30), (131072, 128)):
        tab = jnp.asarray(rng.random((R, L), np.float32))
        idx0 = jnp.asarray(rng.integers(0, R, (H, W)), jnp.int32)

        def ga(eps, tab, idx0, R=R):
            idx = jnp.minimum(idx0 + eps.astype(jnp.int32), R - 1)
            (g,) = jax.lax.optimization_barrier((tab[idx],))
            return g.sum(-1)

        res[f"ga_r{R}_L{L}"] = bench(ga, tab, idx0)
        print(f"ga_r{R}_L{L}", res[f"ga_r{R}_L{L}"], flush=True)

print(json.dumps(res))
