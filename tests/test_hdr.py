"""Radiance .hdr loader tests (resources/hdr.py).

The reference's IBL chain is built to consume an equirect .hdr environment
(assets/README.md + .MISSING_LARGE_BLOBS:1; equirect_to_cubemap.hlsl:22-105
converts it) — these tests cover the RGBE decode (RLE runs, literals, flat
streams), the encode/decode roundtrip, and the full-scene IBL wiring off a
checked-in 64x32 sky asset.
"""

import os

import numpy as np
import pytest

from renderer_rs_tpu.core.errors import ResourceError
from renderer_rs_tpu.resources.hdr import _decode_rgbe, encode_hdr, load_hdr

ASSET = os.path.join(os.path.dirname(__file__), "assets", "sky_equirect_64x32.hdr")


def test_roundtrip_tolerance(tmp_path):
    rng = np.random.default_rng(3)
    img = (rng.uniform(0.0, 1.0, (16, 24, 3)) ** 2.0 * 50.0).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    encode_hdr(p, img)
    back = load_hdr(p)
    assert back.shape == (16, 24, 3)
    # shared 8-bit mantissa: error bounds relative to the PIXEL's max
    # channel (small channels under a large max lose precision by design)
    rel = np.abs(back - img) / np.maximum(img.max(axis=-1, keepdims=True), 1e-2)
    assert rel.max() < 0.02


def test_rle_runs_decode(tmp_path):
    """Hand-built scanline with repeat-runs (>128 marker) decodes exactly."""
    w, h = 16, 1
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    scan = bytes([2, 2, 0, w])
    # R: run of 16 x 128; G: run 8 x 0 + run 8 x 64; B: literal 16 bytes;
    # E: run 16 x 130 (scale 2^-6)
    scan += bytes([128 + 16, 128])
    scan += bytes([128 + 8, 0, 128 + 8, 64])
    scan += bytes([16]) + bytes(range(16))
    scan += bytes([128 + 16, 130])
    p = str(tmp_path / "rle.hdr")
    open(p, "wb").write(header + scan)
    img = load_hdr(p)
    scale = 2.0 ** (130 - 136)
    np.testing.assert_allclose(img[0, :, 0], 128 * scale)
    np.testing.assert_allclose(img[0, :8, 1], 0.0)
    np.testing.assert_allclose(img[0, 8:, 1], 64 * scale)
    np.testing.assert_allclose(img[0, :, 2], np.arange(16) * scale)


def test_flat_rgbe_decode(tmp_path):
    """Widths < 8 use the flat (non-RLE) stream."""
    w, h = 4, 2
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 200
    rgbe[..., 3] = 136  # scale 1.0
    p = str(tmp_path / "flat.hdr")
    open(p, "wb").write(header + rgbe.tobytes())
    img = load_hdr(p)
    np.testing.assert_allclose(img[..., 0], 200.0)
    np.testing.assert_allclose(img[..., 1:], 0.0)


def test_zero_exponent_is_black():
    rgbe = np.array([[10, 20, 30, 0]], np.uint8)
    np.testing.assert_array_equal(_decode_rgbe(rgbe), np.zeros((1, 3)))


def test_header_errors(tmp_path):
    p = str(tmp_path / "bad.hdr")
    open(p, "wb").write(b"JUNK")
    with pytest.raises(ResourceError):
        load_hdr(p)
    open(p, "wb").write(b"#?RADIANCE\n\n-Y 2 +X 2\n")  # no FORMAT line
    with pytest.raises(ResourceError):
        load_hdr(p)


def test_checked_in_sky_asset():
    img = load_hdr(ASSET)
    assert img.shape == (32, 64, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0
    assert img.max() > 10.0  # the HDR sun disk survives the encode


def test_full_scene_ibl_from_hdr():
    """--scene full --hdr <file>: the IBL chain consumes the equirect
    (VERDICT r2 item 4); the rendered sky shows the file's colors."""
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 96, 64
    scene, layout, kwargs, _ = full_scene(w, h, tri_budget=200, hdr=ASSET)
    assert layout.has_environment
    out = np.asarray(
        forward_frame(
            scene, layout, GraphicsPipelineBuilder().build(),
            kwargs["shading"], w, h, tonemap="aces",
            shadow_map_size=128, shadow_params=kwargs["shadow_params"],
        )
    )
    assert np.isfinite(out).all()
    # the environment cubemap came from the FILE with the right orientation:
    # +Y (zenith) is blue-dominant sky, -Y (nadir) is the dark warm ground
    sky = np.asarray(scene.environment.skybox_mips[0])
    up = sky[2].mean(axis=(0, 1))
    down = sky[3].mean(axis=(0, 1))
    assert up[2] > up[0] * 1.02, f"zenith not blue-dominant: {up}"
    assert down.mean() < up.mean(), "nadir brighter than zenith (flipped?)"


def test_native_rle_decode_matches_python(tmp_path, monkeypatch):
    """The C++ RLE decoder (native/imageio.cpp::decode_hdr_rle) is
    bit-equal to the Python fallback on both the checked-in asset and a
    synthetic roundtrip with long runs (worst-case RLE shapes)."""
    from renderer_rs_tpu.resources import hdr as H

    if H._native_imageio() is None:
        import pytest

        pytest.skip("native/libimageio.so not built")

    rng = np.random.default_rng(3)
    img = (rng.random((17, 256, 3)) * 8.0).astype(np.float32)
    img[:, 40:200] = 0.25  # constant span -> repeated-byte runs
    p = str(tmp_path / "rt.hdr")
    H.encode_hdr(p, img)

    for path in (ASSET, p):
        native = H.load_hdr(path)
        monkeypatch.setenv("RENDERER_NO_NATIVE_HDR", "1")
        python = H.load_hdr(path)
        monkeypatch.delenv("RENDERER_NO_NATIVE_HDR")
        np.testing.assert_array_equal(native, python)


def test_encode_narrow_width_roundtrip(tmp_path):
    """Widths outside [8, 32768) must emit flat RGBE (the spec forbids
    new-style RLE there); load_hdr round-trips them exactly."""
    import numpy as np

    from renderer_rs_tpu.resources.hdr import encode_hdr, load_hdr

    rng = np.random.default_rng(7)
    img = rng.uniform(0.0, 4.0, (5, 4, 3)).astype(np.float32)
    p = str(tmp_path / "narrow.hdr")
    encode_hdr(p, img)
    out = load_hdr(p)
    assert out.shape == (5, 4, 3)
    # RGBE is lossy (8-bit shared-exponent mantissa): relative error < 1%
    assert np.all(np.abs(out - img) <= 0.01 * np.maximum(img.max(-1, keepdims=True), 1e-6))
