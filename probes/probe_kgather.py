"""Micro-costs of the in-kernel gather-resolve primitives (TPU).

Measures, per chunk-equivalent iteration at the production shapes
([chunk=128, 128] slab, [16, 128] pixel planes):
  - [128,128] f32 transpose
  - one lane dynamic_gather ([16,128] take_along_axis axis=1)
  - the full 50-channel resolve combo (transpose + 50x slice/bcast/gather)
so the defer_kernel stage's ~7 ms in-kernel cost can be attributed and
attacked. Grid-loops a synthetic kernel N times; reports ms per iteration.

MICROPROBE CAVEAT (docs/tpu_cost_model.md): composes differently at frame
level; use to RANK schemes, trust probe_stages for totals.
"""
import sys, os, time, json

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = int(os.environ.get("KG_ITERS", "4096"))
SUB_H, TW, CH = 16, 128, 128


def run(body_fn, n_out=1):
    def kernel(slab_ref, p_ref, o_ref):
        def body(j, acc):
            return body_fn(slab_ref[...], p_ref[...], acc, j)

        o_ref[...] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((SUB_H, TW), jnp.float32)
        )

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB_H, TW), jnp.float32),
    )
    rng = np.random.default_rng(0)
    slab = jnp.asarray(rng.standard_normal((CH, 128)).astype(np.float32))
    p = jnp.asarray(rng.integers(0, CH, (SUB_H, TW)).astype(np.int32))
    g = jax.jit(f)
    out = g(slab, p)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = g(slab + 1e-6, p)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return dt / ITERS * 1e6  # us per iteration


res = {}

# 1. transpose only
def t_only(slab, p, acc, j):
    s = slab + j.astype(jnp.float32) * 1e-12  # defeat loop-invariant hoist
    sT = jnp.swapaxes(s, 0, 1)
    return acc + sT[0:SUB_H, :]

res["transpose_us"] = round(run(t_only), 3)
print("transpose_us", res["transpose_us"], flush=True)

# 2. one gather (no transpose): row 0 broadcast + take_along_axis
def g_only(slab, p, acc, j):
    row = slab[0:1, :] + j.astype(jnp.float32) * 1e-12
    xk = jnp.broadcast_to(row, (SUB_H, TW))
    return acc + jnp.take_along_axis(xk, p, axis=1)

res["gather1_us"] = round(run(g_only), 3)
print("gather1_us", res["gather1_us"], flush=True)

# 3. 8 gathers from a shared transposed slab
def g8(slab, p, acc, j):
    s = slab + j.astype(jnp.float32) * 1e-12
    sT = jnp.swapaxes(s, 0, 1)
    for k in range(8):
        xk = jnp.broadcast_to(sT[k : k + 1, :], (SUB_H, TW))
        acc = acc + jnp.take_along_axis(xk, p, axis=1)
    return acc

res["tr_gather8_us"] = round(run(g8), 3)
print("tr_gather8_us", res["tr_gather8_us"], flush=True)

# 4. the full production combo: transpose + 50 gathers + blend-ish FMAs
def g50(slab, p, acc, j):
    s = slab + j.astype(jnp.float32) * 1e-12
    sT = jnp.swapaxes(s, 0, 1)
    tot = acc
    for k in range(50):
        xk = jnp.broadcast_to(sT[k : k + 1, :], (SUB_H, TW))
        tot = tot + jnp.take_along_axis(xk, p, axis=1)
    return tot

res["tr_gather50_us"] = round(run(g50), 3)
print("tr_gather50_us", res["tr_gather50_us"], flush=True)

# 5. axis=0 full-row gather alternative: REJECTED — tpu.dynamic_gather
#    with dimensions=[0] at [128,128] fails Mosaic compile on v5e
#    ("Not implemented"); only the lane (axis=1) gather is available.

# 6. masked-sum baseline: what ONE channel costs the old fused way
def msum(slab, p, acc, j):
    s = slab + j.astype(jnp.float32) * 1e-12
    uf = (
        jax.lax.broadcasted_iota(jnp.int32, (CH, SUB_H, TW), 0)
        == p[None]
    ).astype(jnp.float32)
    col = s[:, 0:1].reshape(CH, 1, 1)
    return acc + jnp.sum(col * uf, axis=0)

res["maskedsum1_us"] = round(run(msum), 3)
print("maskedsum1_us", res["maskedsum1_us"], flush=True)

print(json.dumps(res))
