"""Cook-Torrance PBR (metallic-roughness) — ≙ shaders/hlsl/pbr.hlsli.

Vectorized over pixels; exact reference constants:
- PI, EPSILON = 1e-4 (pbr.hlsli:17-18)
- GGX with Disney roughness² remap (pbr.hlsli:57-74)
- Smith-Schlick geometry, direct k = (r+1)²/8 (pbr.hlsli:85-120),
  IBL k = r²/2 (compute/brdf_lut.hlsl)
- Fresnel-Schlick + roughness variant with F90 = max(1-r, F0)
  (pbr.hlsli:131-156)
- F0 = lerp(0.04, albedo, metallic) (pbr.hlsli:168-180)
- CalculatePBRDirect = (kD·albedo/π + DGF/(4·NdotV·NdotL+ε))·radiance·NdotL
  (pbr.hlsli:279-329)
- CalculateIBL split-sum with MAX_REFLECTION_LOD derived from the
  prefiltered-map mip count (reference fixes 7 for a 128² map,
  pbr.hlsli:370-373)
- hemisphere ambient fallback with the reference's sky/ground colors
  (pbr.hlsli:480-490)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from renderer_rs_tpu.mathx.vec import dot, normalize, saturate

PI = 3.14159265358979323846
EPSILON = 1e-4


@struct.dataclass
class PBRMaterialParams:
    """Per-pixel material buffers (≙ PBRMaterial struct, pbr.hlsli:33-40)."""

    albedo: Any  # [...,3] linear
    metallic: Any  # [...]
    roughness: Any  # [...]
    ao: Any  # [...]
    emissive: Any  # [...,3]


def distribution_ggx(n: jnp.ndarray, h: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """GGX/Trowbridge-Reitz NDF with Disney r² remap (pbr.hlsli:57-74)."""
    a = roughness * roughness
    a2 = a * a
    ndoth = jnp.maximum(dot(n, h)[..., 0], 0.0)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    denom = PI * denom * denom
    return a2 / jnp.maximum(denom, EPSILON)


def geometry_schlick_ggx(ndotx: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Single-direction Schlick-GGX, direct-lighting k=(r+1)²/8 (pbr.hlsli:85-101)."""
    r = roughness + 1.0
    k = (r * r) / 8.0
    return ndotx / jnp.maximum(ndotx * (1.0 - k) + k, EPSILON)


def geometry_smith(
    n: jnp.ndarray, v: jnp.ndarray, l: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """Smith's method (pbr.hlsli:104-120)."""
    ndotv = jnp.maximum(dot(n, v)[..., 0], 0.0)
    ndotl = jnp.maximum(dot(n, l)[..., 0], 0.0)
    return geometry_schlick_ggx(ndotv, roughness) * geometry_schlick_ggx(ndotl, roughness)


def fresnel_schlick(cos_theta: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
    """Schlick approximation with saturate guard (pbr.hlsli:131-136)."""
    ct = saturate(cos_theta)
    return f0 + (1.0 - f0) * jnp.power(1.0 - ct, 5.0)


def fresnel_schlick_roughness(
    cos_theta: jnp.ndarray, f0: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """IBL Fresnel: F90 = max(1-roughness, F0) (pbr.hlsli:138-151)."""
    ct = saturate(cos_theta)
    f90 = jnp.maximum(1.0 - roughness, f0)
    return f0 + (f90 - f0) * jnp.power(1.0 - ct, 5.0)


def calculate_f0(albedo: jnp.ndarray, metallic: jnp.ndarray) -> jnp.ndarray:
    """F0 = lerp(0.04, albedo, metallic) (pbr.hlsli:168-180)."""
    dielectric = jnp.full_like(albedo, 0.04)
    return dielectric + (albedo - dielectric) * metallic


def clamp_roughness(roughness: jnp.ndarray) -> jnp.ndarray:
    """≙ ClampRoughness (pbr.hlsli:473-477): floor at 0.04."""
    return jnp.maximum(roughness, 0.04)


def pbr_direct(
    n: jnp.ndarray,
    v: jnp.ndarray,
    l: jnp.ndarray,
    radiance: jnp.ndarray,
    mat: PBRMaterialParams,
) -> jnp.ndarray:
    """≙ CalculatePBRDirect (pbr.hlsli:279-329). All [...,3] / [...] buffers.

    Does NOT include AO or emissive (per the reference's contract).
    """
    roughness = mat.roughness[..., None] if mat.roughness.ndim < n.ndim else mat.roughness
    metallic = mat.metallic[..., None] if mat.metallic.ndim < n.ndim else mat.metallic
    r = roughness[..., 0] if roughness.shape[-1] == 1 else roughness

    h = normalize(v + l)
    f0 = calculate_f0(mat.albedo, metallic)

    ndf = distribution_ggx(n, h, r)
    g = geometry_smith(n, v, l, r)
    f = fresnel_schlick(dot(h, v), f0)

    ks = f
    kd = (1.0 - ks) * (1.0 - metallic)

    ndotv = jnp.maximum(dot(n, v)[..., 0], 0.0)
    ndotl = jnp.maximum(dot(n, l)[..., 0], 0.0)
    numerator = (ndf * g)[..., None] * f
    denominator = 4.0 * ndotv * ndotl + EPSILON
    specular = numerator / denominator[..., None]

    return (kd * mat.albedo / PI + specular) * radiance * ndotl[..., None]


def pbr_direct_split(
    n: jnp.ndarray,
    v: jnp.ndarray,
    l: jnp.ndarray,
    radiance: jnp.ndarray,
    albedo: jnp.ndarray,
    metallic: jnp.ndarray,
    roughness: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """pbr_direct factored into albedo-linear form: returns
    (diff_coef, spec) with pbr_direct == albedo * diff_coef + spec.

    diff_coef = kd/π · radiance · NdotL   (the albedo multiplier)
    spec      = DGF/(4·NdotV·NdotL) · radiance · NdotL

    The half-rate lighting path (renderer/passes) evaluates BOTH at
    reduced rate and multiplies the full-rate albedo in at composite
    time, preserving texture detail in the diffuse term. Note spec still
    references albedo through F0 = lerp(0.04, albedo, metallic) — metal
    tint detail rides at the reduced rate (quality-gated)."""
    r = roughness
    m = metallic[..., None] if metallic.ndim < n.ndim else metallic

    h = normalize(v + l)
    f0 = calculate_f0(albedo, m)

    ndf = distribution_ggx(n, h, r)
    g = geometry_smith(n, v, l, r)
    f = fresnel_schlick(dot(h, v), f0)

    kd = (1.0 - f) * (1.0 - m)

    ndotv = jnp.maximum(dot(n, v)[..., 0], 0.0)
    ndotl = jnp.maximum(dot(n, l)[..., 0], 0.0)
    numerator = (ndf * g)[..., None] * f
    denominator = 4.0 * ndotv * ndotl + EPSILON
    specular = numerator / denominator[..., None]

    rl = radiance * ndotl[..., None]
    return kd / PI * rl, specular * rl


def calculate_ibl_fast_split(
    n: jnp.ndarray,
    v: jnp.ndarray,
    albedo: jnp.ndarray,
    metallic: jnp.ndarray,
    roughness: jnp.ndarray,
    irradiance_sh: jnp.ndarray,
    prefiltered: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """calculate_ibl_fast factored pre-albedo/pre-ao: returns
    (diff_coef, spec) with ibl_fast == (albedo*diff_coef + spec) * ao."""
    from renderer_rs_tpu.ops.ibl import sh9_eval

    m = metallic[..., None] if metallic.ndim < n.ndim else metallic
    f0 = calculate_f0(albedo, m)
    ndotv = jnp.maximum(dot(n, v)[..., 0], 0.0)
    f = fresnel_schlick_roughness(ndotv[..., None], f0, roughness[..., None])
    kd = (1.0 - f) * (1.0 - m)

    diff_coef = kd * sh9_eval(irradiance_sh, n)
    scale, bias = env_brdf_approx(ndotv, roughness)
    spec = prefiltered * (f0 * scale[..., None] + bias[..., None])
    return diff_coef, spec


def calculate_ibl(
    n: jnp.ndarray,
    v: jnp.ndarray,
    r: jnp.ndarray,
    mat: PBRMaterialParams,
    irradiance_mips: tuple,
    prefiltered_mips: tuple,
    brdf_lut: jnp.ndarray,
    prefiltered_atlas: jnp.ndarray | None = None,
    prefiltered_atlas_offsets=None,
    prefiltered_atlas_sizes=None,
) -> jnp.ndarray:
    """≙ CalculateIBL split-sum (pbr.hlsli:399-466).

    irradiance_mips/prefiltered_mips: CubeMap.mips tuples ([6,H,W,C] levels);
    brdf_lut: [L,L,2+] with (scale, bias) in rg, indexed by (NdotV, roughness).
    """
    from renderer_rs_tpu.ops.sampling import (
        Sampler,
        sample_bilinear,
        sample_cubemap,
        sample_cubemap_lod,
    )

    metallic = mat.metallic[..., None]
    roughness = mat.roughness
    f0 = calculate_f0(mat.albedo, metallic)
    ndotv = jnp.maximum(dot(n, v)[..., 0], 0.0)
    f = fresnel_schlick_roughness(ndotv[..., None], f0, roughness[..., None])
    ks = f
    kd = (1.0 - ks) * (1.0 - metallic)

    # Diffuse: irradiance map sampled along N (pbr.hlsli:434-436)
    irradiance = sample_cubemap(irradiance_mips[0], n)[..., :3]
    diffuse = irradiance * mat.albedo

    # Specular: prefiltered map at mip = roughness * max_lod (pbr.hlsli:444-450)
    max_lod = float(len(prefiltered_mips) - 1)
    prefiltered = sample_cubemap_lod(
        prefiltered_mips, r, roughness * max_lod,
        atlas=prefiltered_atlas,
        offsets=prefiltered_atlas_offsets,
        sizes=prefiltered_atlas_sizes,
    )[..., :3]
    # BRDF LUT indexed by (NdotV, roughness) (pbr.hlsli:456-457) — 2x2 window
    # packed into channels so the bilinear fetch is one gather per pixel
    lut = brdf_lut
    right = jnp.concatenate([lut[:, 1:], lut[:, -1:]], axis=1)
    down = jnp.concatenate([lut[1:], lut[-1:]], axis=0)
    downright = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    window = jnp.concatenate([lut, right, down, downright], axis=-1)  # [L,L,8]
    lsz = lut.shape[0]
    x = ndotv * lut.shape[1] - 0.5
    y = roughness * lsz - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    taps = window[
        jnp.clip(y0, 0, lsz - 1), jnp.clip(x0, 0, lut.shape[1] - 1)
    ]  # [...,8]
    cch = lut.shape[-1]
    top = taps[..., 0:cch] * (1 - fx) + taps[..., cch : 2 * cch] * fx
    bot = taps[..., 2 * cch : 3 * cch] * (1 - fx) + taps[..., 3 * cch : 4 * cch] * fx
    brdf = top * (1 - fy) + bot * fy
    specular = prefiltered * (f0 * brdf[..., 0:1] + brdf[..., 1:2])

    return (kd * diffuse + specular) * mat.ao[..., None]


# Least-squares fit of brdf_lut(64, samples=2048) over (NdotV, roughness):
# bivariate degree-5 polynomial + {exp2(-9.28·NdotV), ·r, sqrt(NdotV), ·r}
# capture terms for the grazing ridge. Mean abs error 0.011/0.006
# (scale/bias), ~5x tighter than Karis's mobile a004 fit against this LUT.
# Term order: (i,j) = NdotV^i · r^j for i+j<=5 (j-major), then the 4 extras.
_ENV_BRDF_SCALE_C = (
    -0.20467638, 0.40553972, 2.20926974, -2.35092346, -0.60635421, 0.48959697,
    10.53988158, -16.00064446, 0.11307607, 7.34674485, -0.07783143,
    -17.61123712, 32.42396798, -15.63481490, -4.38756696,
    14.69254720, -21.28281969, 11.86844660, -5.80202789, 2.71048390,
    1.03621796, 0.37388853, 0.16790994, -1.65275117, 2.09886709,
)
_ENV_BRDF_BIAS_C = (
    1.65195669, -2.98117197, 0.95465251, 3.10094792, -3.35848621, 0.92791413,
    -9.90206078, 18.91299216, -12.33896654, 2.14557775, 1.25509294,
    16.97517378, -27.56190032, 16.23656581, -4.03276973,
    -14.85912427, 16.55409020, -4.76333227, 6.40965134, -3.57892007,
    -1.09046371, -0.83260557, 0.64060156, 0.83105539, -1.51038790,
)


def env_brdf_approx(
    ndotv: jnp.ndarray, roughness: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic split-sum environment BRDF (scale, bias).

    Replaces the per-pixel BRDF-LUT gather of CalculateIBL
    (pbr.hlsli:456-457) — per-pixel gathers cost ~10 ms/frame at 1080p on
    TPU — with ~60 VPU flops of fitted polynomial (coefficients above).
    """
    x = saturate(ndotv)
    y = saturate(roughness)
    terms = []
    xi = jnp.ones_like(x)
    for i in range(6):
        yj = xi
        for _ in range(6 - i):
            terms.append(yj)
            yj = yj * y
        xi = xi * x
    e = jnp.exp2(-9.28 * x)
    sx = jnp.sqrt(x)
    terms += [e, e * y, sx, sx * y]
    scale = sum(c * t for c, t in zip(_ENV_BRDF_SCALE_C, terms))
    bias = sum(c * t for c, t in zip(_ENV_BRDF_BIAS_C, terms))
    return saturate(scale), saturate(bias)


def calculate_ibl_fast(
    n: jnp.ndarray,
    v: jnp.ndarray,
    mat: PBRMaterialParams,
    irradiance_sh: jnp.ndarray,
    prefiltered: jnp.ndarray,
) -> jnp.ndarray:
    """Gather-free CalculateIBL: SH9 diffuse + analytic BRDF.

    Same kS/kD split-sum structure as calculate_ibl (pbr.hlsli:399-466);
    `prefiltered` is the specular radiance already fetched by the caller
    (the merged specular/skybox atlas lookup in renderer/passes.py).
    """
    from renderer_rs_tpu.ops.ibl import sh9_eval

    metallic = mat.metallic[..., None]
    roughness = mat.roughness
    f0 = calculate_f0(mat.albedo, metallic)
    ndotv = jnp.maximum(dot(n, v)[..., 0], 0.0)
    f = fresnel_schlick_roughness(ndotv[..., None], f0, roughness[..., None])
    ks = f
    kd = (1.0 - ks) * (1.0 - metallic)

    diffuse = sh9_eval(irradiance_sh, n) * mat.albedo
    scale, bias = env_brdf_approx(ndotv, roughness)
    specular = prefiltered * (f0 * scale[..., None] + bias[..., None])
    return (kd * diffuse + specular) * mat.ao[..., None]


def hemisphere_ambient(n: jnp.ndarray, albedo: jnp.ndarray, ao: jnp.ndarray) -> jnp.ndarray:
    """≙ CalculateHemisphereAmbient (pbr.hlsli:480-490): lerp between warm
    ground (0.08,0.06,0.04) and cool sky (0.15,0.18,0.25) on N.y."""
    sky = jnp.array([0.15, 0.18, 0.25], jnp.float32)
    ground = jnp.array([0.08, 0.06, 0.04], jnp.float32)
    up = n[..., 1:2] * 0.5 + 0.5
    ambient = ground + (sky - ground) * up
    return ambient * albedo * ao[..., None]
