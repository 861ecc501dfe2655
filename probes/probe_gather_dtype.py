"""Gather-rate microprobe: [2M] random-index row gathers from a [R, C]
table at f32 / bf16 / u8 / u8->decode, to size the material-atlas dtype
diet. eps-perturb defeats the tunnel's identical-dispatch cache."""
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


def bench(fn):
    @jax.jit
    def f(eps):
        idx = jnp.minimum(idx0 + eps, R - 1)
        return fn(idx)

    out = f(jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = f(jnp.int32(i % 2))
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / FRAMES * 1000.0, 2)


res = {}
res["f32"] = bench(lambda idx: tab_f32[idx].sum(-1))
print("f32", res["f32"], flush=True)
res["bf16"] = bench(lambda idx: tab_bf16[idx].astype(jnp.float32).sum(-1))
print("bf16", res["bf16"], flush=True)
res["u8"] = bench(lambda idx: tab_u8[idx].astype(jnp.float32).sum(-1))
print("u8", res["u8"], flush=True)


def u8_decode(idx):
    t = tab_u8[idx].astype(jnp.float32) * (1.0 / 255.0)
    # IEC sRGB decode on 13 of the channels' worth (apply to all for cost UB)
    lo = t / 12.92
    hi = ((t + 0.055) / 1.055) ** 2.4
    return jnp.where(t <= 0.04045, lo, hi).sum(-1)


res["u8_decode"] = bench(u8_decode)
print("u8_decode", res["u8_decode"], flush=True)

# narrower rows: the 52-lane (f32) variant for comparison
tab_f32_40 = tab_f32[:, :40]
res["f32_c40"] = bench(lambda idx: tab_f32_40[idx].sum(-1))
print("f32_c40", res["f32_c40"], flush=True)
print(json.dumps(res))
