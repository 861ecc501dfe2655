"""Gather-rate microprobe: [2M] random-index row gathers from a [R, C]
table at f32 / bf16 / u8 / u8->decode, to size the material-atlas dtype
diet. eps-perturb defeats the tunnel's identical-dispatch cache.
Tables ride as jit ARGUMENTS (closure constants embed in the
remote-compile HTTP body and 413 past ~100 MB)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

H, W = 1080, 1920
R = 6 * 256 * 256  # ~ material atlas row count
C = 104
rng = np.random.default_rng(0)
idx0 = jnp.asarray(rng.integers(0, R, (H, W)), jnp.int32)
tab_f32 = jnp.asarray(rng.random((R, C), np.float32))
tab_bf16 = tab_f32.astype(jnp.bfloat16)
tab_u8 = jnp.asarray(rng.integers(0, 256, (R, C)), jnp.uint8)

FRAMES = 12


def bench(fn, tab):
    @jax.jit
    def f(eps, tab, idx0):
        idx = jnp.minimum(idx0 + eps, R - 1)
        return fn(idx, tab)

    out = f(jnp.int32(0), tab, idx0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = f(jnp.int32(i % 2), tab, idx0)
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / FRAMES * 1000.0, 2)


res = {}
res["f32"] = bench(lambda idx, tab: tab[idx].sum(-1), tab_f32)
print("f32", res["f32"], flush=True)
res["bf16"] = bench(
    lambda idx, tab: tab[idx].astype(jnp.float32).sum(-1), tab_bf16
)
print("bf16", res["bf16"], flush=True)
res["u8"] = bench(
    lambda idx, tab: tab[idx].astype(jnp.float32).sum(-1), tab_u8
)
print("u8", res["u8"], flush=True)


def u8_decode(idx, tab):
    t = tab[idx].astype(jnp.float32) * (1.0 / 255.0)
    # IEC sRGB decode on 13 of the channels' worth (apply to all for cost UB)
    lo = t / 12.92
    hi = ((t + 0.055) / 1.055) ** 2.4
    return jnp.where(t <= 0.04045, lo, hi).sum(-1)


res["u8_decode"] = bench(u8_decode, tab_u8)
print("u8_decode", res["u8_decode"], flush=True)

# narrower rows: the 40-lane (f32) variant for comparison
res["f32_c40"] = bench(
    lambda idx, tab: tab[:, :40][idx].sum(-1), tab_f32
)
print("f32_c40", res["f32_c40"], flush=True)
print(json.dumps(res))
