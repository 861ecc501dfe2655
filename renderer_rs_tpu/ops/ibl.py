"""IBL precompute programs — ≙ shaders/hlsl/compute/*.hlsl, as one-time
jitted array programs (SURVEY.md §7 step 6).

- equirect_to_cubemap: face texel -> direction -> equirect UV (atan2/asin)
  -> bilinear sample (≙ equirect_to_cubemap.hlsl:22-105; identical face
  basis, verified against GetCubemapDirection's 6-way switch).
- irradiance_map: diffuse cosine convolution. The reference Riemann-sums a
  hemisphere grid per texel (irradiance_map.hlsl:63-143, sampleDelta 0.025);
  the TPU-native form evaluates the SAME integral as a cosine-weighted
  matmul over environment texels with exact per-texel solid angles — one
  MXU contraction instead of 15k gathers per texel, and more accurate.
- prefilter_map: GGX importance sampling with Hammersley sequence, N=V=R,
  PDF-based source-mip selection for firefly reduction, NdotL weighting,
  mirror shortcut for roughness < 0.01 (≙ prefilter_map.hlsl:130-229). The
  Hammersley/H-vector/per-sample mip math is *static* per sample index, so
  the sample loop unrolls into pure cubemap gathers.
- brdf_lut: split-sum (scale, bias) Monte Carlo with SAMPLE_COUNT=1024 and
  the IBL geometry remap k = r²/2 (≙ brdf_lut.hlsl:119-206).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

PI = math.pi


# --- face geometry (≙ GetCubemapDirection, equirect_to_cubemap.hlsl:22-56) ----

def cubemap_directions(size: int) -> jnp.ndarray:
    """Per-texel outward directions [6,S,S,3] (pixel centers), face order
    +X,-X,+Y,-Y,+Z,-Z with the reference's exact basis."""
    t = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    v, u = np.meshgrid(t, t, indexing="ij")  # v = rows (y), u = cols (x)
    one = np.ones_like(u)
    faces = np.stack(
        [
            np.stack([one, -v, -u], -1),   # +X
            np.stack([-one, -v, u], -1),   # -X
            np.stack([u, one, v], -1),     # +Y
            np.stack([u, -one, -v], -1),   # -Y
            np.stack([u, -v, one], -1),    # +Z
            np.stack([-u, -v, -one], -1),  # -Z
        ]
    )
    faces /= np.linalg.norm(faces, axis=-1, keepdims=True)
    return jnp.asarray(faces)


def cubemap_solid_angles(size: int) -> jnp.ndarray:
    """Exact per-texel solid angle [S,S] (same for every face):
    dω = dA / (u²+v²+1)^(3/2), dA = (2/S)²."""
    t = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    v, u = np.meshgrid(t, t, indexing="ij")
    da = (2.0 / size) ** 2
    return jnp.asarray(da / np.power(u * u + v * v + 1.0, 1.5))


# --- equirect -> cubemap --------------------------------------------------------

def equirect_to_cubemap(equirect: jnp.ndarray, size: int) -> jnp.ndarray:
    """≙ equirect_to_cubemap.hlsl main: returns [6,S,S,C].

    UV mapping: u = (atan2(z,x)+π)/2π, v = (asin(y)+π/2)/π
    (DirectionToEquirectUV, equirect_to_cubemap.hlsl:59-76).
    """
    from renderer_rs_tpu.ops.sampling import Sampler, sample_bilinear

    d = cubemap_directions(size)
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    theta = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    uv = jnp.stack([(phi + PI) / (2.0 * PI), (theta + PI * 0.5) / PI], axis=-1)
    return sample_bilinear(equirect, uv, Sampler.linear_clamp())


# --- irradiance convolution ------------------------------------------------------

def irradiance_map(env_faces: jnp.ndarray, size: int = 32) -> jnp.ndarray:
    """Diffuse irradiance cubemap [6,S,S,3] from env [6,E,E,C].

    E(N) = (1/π) Σ_texels L_i · max(0, N·d_i) · ω_i — the integral the
    reference's hemisphere Riemann sum approximates (irradiance_map.hlsl:
    89-140, weight cosθ·sinθ, final ·π/N). Contraction over env texels runs
    on the MXU.
    """
    e = env_faces.shape[1]
    env_dirs = cubemap_directions(e).reshape(-1, 3)  # [M,3]
    omega = jnp.tile(cubemap_solid_angles(e).reshape(-1), (6,))  # [M]
    radiance = env_faces[..., :3].reshape(-1, 3)  # [M,3]
    weighted = radiance * omega[:, None]  # [M,3]

    out_dirs = cubemap_directions(size).reshape(-1, 3)  # [K,3]

    def chunk_fn(carry, idx):
        # cos-lobe weights for a chunk of output normals against ALL env texels
        n = jax.lax.dynamic_slice(out_dirs, (idx, 0), (CHUNK, 3))
        cos = jnp.maximum(n @ env_dirs.T, 0.0)  # [CHUNK,M] — MXU
        acc = cos @ weighted  # [CHUNK,3] — MXU
        return carry, acc

    CHUNK = min(512, out_dirs.shape[0])
    k = out_dirs.shape[0]
    n_chunks = (k + CHUNK - 1) // CHUNK
    pad = n_chunks * CHUNK - k
    out_dirs = jnp.pad(out_dirs, ((0, pad), (0, 0)))
    _, res = jax.lax.scan(
        chunk_fn, None, jnp.arange(n_chunks) * CHUNK
    )
    irr = res.reshape(-1, 3)[:k] / PI
    return irr.reshape(6, size, size, 3)


# --- GGX importance sampling (static per sample index) ----------------------------

def _radical_inverse_vdc(i: int) -> float:
    """Van der Corput radical inverse (≙ RadicalInverse_VdC)."""
    bits = i
    bits = (bits << 16 | bits >> 16) & 0xFFFFFFFF
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    return bits * 2.3283064365386963e-10


def hammersley(i: int, n: int) -> tuple[float, float]:
    """≙ Hammersley (prefilter_map.hlsl:42-45)."""
    return i / n, _radical_inverse_vdc(i)


def _ggx_half_vector(xi: tuple[float, float], roughness: float) -> tuple[float, float, float]:
    """Tangent-space H from the GGX inverse CDF (≙ ImportanceSampleGGX,
    prefilter_map.hlsl:55-80). Static math — plain Python floats."""
    a = roughness * roughness
    phi = 2.0 * PI * xi[0]
    cos_theta = math.sqrt((1.0 - xi[1]) / (1.0 + (a * a - 1.0) * xi[1]))
    sin_theta = math.sqrt(max(1.0 - cos_theta * cos_theta, 0.0))
    return (math.cos(phi) * sin_theta, math.sin(phi) * sin_theta, cos_theta)


def _ggx_d(ndoth: float, roughness: float) -> float:
    a = roughness * roughness
    a2 = a * a
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / max(PI * denom * denom, 1e-4)


def prefilter_map(
    env_mips: tuple, base_size: int = 64, levels: int = 5, samples: int = 64
) -> tuple:
    """GGX-prefiltered environment mip chain (tuple of [6,S,S,3]).

    Level l has roughness l/(levels-1) and size base_size>>l
    (≙ prefilter_map.hlsl main; reference default SampleCount is a push
    constant — 64 here, raise for quality).
    """
    from renderer_rs_tpu.ops.sampling import sample_cubemap

    env0 = env_mips[0]
    resolution = env0.shape[1]
    sa_texel = 4.0 * PI / (6.0 * resolution * resolution)

    out = []
    for level in range(levels):
        size = max(base_size >> level, 1)
        roughness = level / max(levels - 1, 1)
        r = cubemap_directions(size)  # N = V = R assumption
        n = r

        if roughness < 0.01:
            # mirror shortcut (prefilter_map.hlsl:162-168)
            out.append(sample_cubemap(env_mips[0], r)[..., :3])
            continue

        # tangent basis per texel (up chosen to avoid parallel-with-N)
        up = jnp.where(
            (jnp.abs(n[..., 2:3]) < 0.999),
            jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
            jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
        )
        tangent = jnp.cross(up, n)
        tangent = tangent / jnp.maximum(
            jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-12
        )
        bitangent = jnp.cross(n, tangent)

        color = jnp.zeros((6, size, size, 3), jnp.float32)
        weight = jnp.zeros((6, size, size, 1), jnp.float32)
        for i in range(samples):
            xi = hammersley(i, samples)
            hx, hy, hz = _ggx_half_vector(xi, roughness)
            h = tangent * hx + bitangent * hy + n * hz
            # L = reflect(V, H) with V = N (prefilter_map.hlsl:183-185)
            vdoth = jnp.sum(n * h, axis=-1, keepdims=True)
            l = 2.0 * vdoth * h - n
            ndotl = jnp.sum(n * l, axis=-1, keepdims=True)

            # static per-sample PDF & source mip (prefilter_map.hlsl:196-211):
            # NdotH == HdotV == hz under N=V=R
            d = _ggx_d(hz, roughness)
            pdf = d * hz / (4.0 * max(hz, 1e-4)) + 1e-4
            sa_sample = 1.0 / (samples * pdf + 1e-4)
            mip = max(0.0, 0.5 * math.log2(sa_sample / sa_texel))
            lvl = min(int(round(mip)), len(env_mips) - 1)

            s = sample_cubemap(env_mips[lvl], l)[..., :3]
            take = ndotl > 0.0
            color = color + jnp.where(take, s * ndotl, 0.0)
            weight = weight + jnp.where(take, ndotl, 0.0)
        out.append(color / jnp.maximum(weight, 1e-6))
    return tuple(out)


# --- BRDF LUT ------------------------------------------------------------------------

def _geometry_smith_ibl(ndotv, ndotl, roughness):
    """Smith geometry with the IBL remap k = r²/2 (brdf_lut.hlsl)."""
    k = (roughness * roughness) / 2.0
    gv = ndotv / jnp.maximum(ndotv * (1.0 - k) + k, 1e-6)
    gl = ndotl / jnp.maximum(ndotl * (1.0 - k) + k, 1e-6)
    return gv * gl


def brdf_lut(size: int = 256, samples: int = 1024, chunk: int = 64) -> jnp.ndarray:
    """Split-sum BRDF integration LUT [S,S,2]: rg = (scale A, bias B),
    U axis = NdotV (clamped ≥ 0.001), V axis = roughness
    (≙ IntegrateBRDF + main, brdf_lut.hlsl:119-206)."""
    t = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    ndotv = jnp.maximum(t[None, :], 0.001)  # [1,S] u axis
    roughness = t[:, None]  # [S,1] v axis
    ndotv = jnp.broadcast_to(ndotv, (size, size))
    roughness = jnp.broadcast_to(roughness, (size, size))

    vx = jnp.sqrt(jnp.maximum(1.0 - ndotv * ndotv, 0.0))
    vz = ndotv  # V = (sin, 0, cos), N = (0,0,1)

    # static sample table
    hs = []
    for i in range(samples):
        hs.append(hammersley(i, samples))
    xi = np.asarray(hs, np.float32)  # [samples,2]

    a_ = roughness * roughness  # [S,S]

    def body(carry, idx):
        acc_a, acc_b = carry
        sl = jax.lax.dynamic_slice(jnp.asarray(xi), (idx, 0), (chunk, 2))
        ph = 2.0 * PI * sl[:, 0]  # [C]
        x2 = sl[:, 1]
        # cosθ depends on per-pixel roughness: [S,S,C]
        a2 = (a_ * a_)[..., None]
        ct = jnp.sqrt((1.0 - x2) / (1.0 + (a2 - 1.0) * x2))
        st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
        hx = jnp.cos(ph) * st
        hy = jnp.sin(ph) * st
        hz = ct
        # L = 2 (V·H) H - V, V=(vx,0,vz)
        vdoth = vx[..., None] * hx + vz[..., None] * hz
        lx = 2.0 * vdoth * hx - vx[..., None]
        lz = 2.0 * vdoth * hz - vz[..., None]
        ndotl = jnp.maximum(lz, 0.0)
        ndoth = jnp.maximum(hz, 0.0)
        vdoth = jnp.maximum(vdoth, 0.0)
        g = _geometry_smith_ibl(ndotv[..., None], ndotl, roughness[..., None])
        g_vis = (g * vdoth) / jnp.maximum(ndoth * ndotv[..., None], 1e-4)
        fc = jnp.power(1.0 - vdoth, 5.0)
        take = (lz > 0.0).astype(jnp.float32)
        acc_a = acc_a + jnp.sum(take * (1.0 - fc) * g_vis, axis=-1)
        acc_b = acc_b + jnp.sum(take * fc * g_vis, axis=-1)
        return (acc_a, acc_b), None

    n_chunks = samples // chunk
    (a_sum, b_sum), _ = jax.lax.scan(
        body,
        (jnp.zeros((size, size)), jnp.zeros((size, size))),
        jnp.arange(n_chunks) * chunk,
    )
    return jnp.stack([a_sum / samples, b_sum / samples], axis=-1).astype(jnp.float32)


# --- spherical-harmonic irradiance (gather-free diffuse IBL) --------------------

def sh9_basis(d: jnp.ndarray) -> jnp.ndarray:
    """Real SH basis l<=2 evaluated along directions [...,3] -> [...,9].

    Standard constants (Ramamoorthi & Hanrahan, "An Efficient Representation
    for Irradiance Environment Maps"). Order: Y00, Y1-1, Y10, Y11, Y2-2,
    Y2-1, Y20, Y21, Y22.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            0.282095 * one,
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3.0 * z * z - 1.0),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )


def sh9_project_cubemap(faces: jnp.ndarray) -> jnp.ndarray:
    """Project a [6,S,S,C] cubemap onto SH9 -> [9,C] coefficients.

    Solid-angle-weighted projection c_lm = Σ f(d)·Y_lm(d)·dω. Projecting the
    already-convolved irradiance cubemap (irradiance_map above) gives a
    gather-free reconstruction that captures >99% of its energy — the cosine
    kernel lives almost entirely in l<=2.
    """
    size = faces.shape[1]
    dirs = cubemap_directions(size)  # [6,S,S,3]
    w = cubemap_solid_angles(size)  # [S,S]
    basis = sh9_basis(dirs)  # [6,S,S,9]
    return jnp.einsum(
        "fyxk,yx,fyxc->kc", basis, w, faces[..., :3].astype(jnp.float32)
    )


def sh9_eval(coeffs: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the projected map along [...,3] directions -> [...,C].

    Pure per-pixel polynomial — replaces the per-pixel irradiance-cubemap
    gather of CalculateIBL (pbr.hlsli:434-436), which costs ~10 ms/frame at
    1080p on TPU. Evaluated as a direct FMA accumulation over the 9 basis
    terms (NOT a stacked [.,9] basis @ [9,C] matmul: the stack materialized
    a [H,W,9] concatenate per frame — ~0.4 GB of HBM traffic — and the tiny
    matmul forced MXU relayouts). Clamped at 0 (ringing guard).
    """
    x = n[..., 0:1]
    y = n[..., 1:2]
    z = n[..., 2:3]
    c = coeffs
    out = (
        0.282095 * c[0]
        + (0.488603 * y) * c[1]
        + (0.488603 * z) * c[2]
        + (0.488603 * x) * c[3]
        + (1.092548 * (x * y)) * c[4]
        + (1.092548 * (y * z)) * c[5]
        + (0.315392 * (3.0 * z * z - 1.0)) * c[6]
        + (1.092548 * (x * z)) * c[7]
        + (0.546274 * (x * x - y * y)) * c[8]
    )
    return jnp.maximum(out, 0.0)


# --- demo environment ------------------------------------------------------------------

def procedural_sky_cubemap(
    size: int = 64,
    sun_direction=(-0.45, -1.0, -0.35),
    zenith=(0.18, 0.32, 0.62),
    horizon=(0.72, 0.78, 0.88),
    ground=(0.22, 0.18, 0.14),
    sun_intensity: float = 24.0,
) -> jnp.ndarray:
    """HDR gradient sky + sun disk [6,S,S,3] — stands in for the stripped HDR
    environment asset (.MISSING_LARGE_BLOBS:1)."""
    d = cubemap_directions(size)
    y = d[..., 1:2]
    sky = jnp.where(
        y >= 0.0,
        jnp.asarray(horizon) + (jnp.asarray(zenith) - jnp.asarray(horizon)) * jnp.power(jnp.abs(y), 0.6),
        jnp.asarray(horizon) + (jnp.asarray(ground) - jnp.asarray(horizon)) * jnp.power(jnp.abs(y), 0.35),
    )
    sun = -jnp.asarray(sun_direction, jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    cos = jnp.sum(d * sun, axis=-1, keepdims=True)
    disk = jnp.power(jnp.maximum(cos, 0.0), 2048.0) * sun_intensity
    halo = jnp.power(jnp.maximum(cos, 0.0), 32.0) * 0.35
    return (sky + (disk + halo) * jnp.array([1.0, 0.93, 0.82])).astype(jnp.float32)
