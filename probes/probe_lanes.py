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
