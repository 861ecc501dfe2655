"""ops — the software-GPU compute library (the reference's shader library).

Every HLSL shader in shaders/hlsl/ (SURVEY.md §2.8) becomes a pure JAX/Pallas
function here:

- raster.py        — the fixed-function stage: triangle setup, coverage,
                     depth test, barycentrics (visibility buffer)
- raster_pallas.py — Pallas tile kernel for the hot rasterization loop
- interpolate.py   — perspective-correct attribute interpolation
- srgb.py          — sRGB<->linear (common.hlsli)
- blinn_phong.py   — lights.hlsli
- pbr.py           — pbr.hlsli (Cook-Torrance, GGX, Smith, Fresnel)
- shadow.py        — shadow.hlsli (PCF) / shadow_csm.hlsli (cascades)
- skybox.py        — skybox.hlsl (inverse-VP ray, cube sample)
- ibl.py           — compute/{equirect_to_cubemap,irradiance_map,
                     prefilter_map,brdf_lut}.hlsl
- sampling.py      — texture units: nearest/bilinear/trilinear, wrap modes,
                     cubemaps (the reference's stubbed texture/sampler tasks,
                     rhi/src/{texture,sampler}.rs)
- tonemap.py       — post-processing
"""
