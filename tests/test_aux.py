"""Aux subsystem tests: profiling stats, checkpoint round-trip, logging,
timer, config, input state, frame manager (SURVEY.md §5 parity)."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from renderer_rs_tpu.core import RendererConfig, Timer
from renderer_rs_tpu.core.logging import parse_env_filter
from renderer_rs_tpu.core.profiling import FrameStats, log_pass_time
from renderer_rs_tpu.platform.input import InputState, KeyCode, MouseButton
from renderer_rs_tpu.renderer.frame_manager import FrameManager


# --- Timer (≙ core timer.rs tests) ---------------------------------------------

def test_timer_tick_delta():
    t = Timer()
    time.sleep(0.01)
    d = t.tick()
    assert 0.005 < d < 1.0
    assert t.delta_secs() == d


def test_timer_reset():
    t = Timer()
    time.sleep(0.01)
    t.reset()
    assert t.elapsed() < 0.01
    assert t.delta_secs() == 0.0


# --- logging filter --------------------------------------------------------------

def test_env_filter_parsing():
    import logging

    default, targets = parse_env_filter("info,renderer_rs_tpu=debug,foo=warn")
    assert default == logging.INFO
    assert targets["renderer_rs_tpu"] == logging.DEBUG
    assert targets["foo"] == logging.WARNING


def test_env_filter_ignores_garbage():
    import logging

    default, targets = parse_env_filter("bogus,x=notalevel")
    assert default == logging.INFO
    assert targets == {}


# --- config -----------------------------------------------------------------------

def test_config_resize_replace():
    c = RendererConfig(width=800, height=600)
    c2 = c.with_size(1920, 1080)
    assert (c.width, c2.width) == (800, 1920)
    assert c2.aspect_ratio() == pytest.approx(16 / 9)


# --- FrameStats ---------------------------------------------------------------------

def test_frame_stats_rolling():
    s = FrameStats(window=4)
    for _ in range(6):
        s.tick()
        time.sleep(0.002)
    assert s.frame_count == 6
    assert s.fps > 0
    assert 0 < s.frame_ms < 1000
    assert "FPS" in s.summary()


def test_log_pass_time_runs():
    with log_pass_time("unit", sync=jnp.ones(4)):
        pass


# --- checkpoint ----------------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    from renderer_rs_tpu.app.scenes import blinnphong_scene
    from renderer_rs_tpu.renderer.checkpoint import load_scene, save_scene

    scene, layout, _, animate = blinnphong_scene(64, 48, rings=4, sectors=6)
    # mutate state (simulate time passing) then checkpoint
    scene2 = animate(scene, 1.5, 0.016)
    path = str(tmp_path / "ckpt.npz")
    save_scene(path, scene2, layout)

    restored, layout_r = load_scene(path, scene)
    assert layout_r == layout
    for a, b in zip(
        __import__("jax").tree.leaves(scene2), __import__("jax").tree.leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_structure_mismatch(tmp_path):
    from renderer_rs_tpu.app.scenes import blinnphong_scene, triangle_scene
    from renderer_rs_tpu.renderer.checkpoint import load_scene, save_scene

    scene, layout, _, _ = blinnphong_scene(64, 48, rings=4, sectors=6)
    other, _, _, _ = triangle_scene(64, 48)
    path = str(tmp_path / "ckpt.npz")
    save_scene(path, scene, layout)
    with pytest.raises(ValueError):
        load_scene(path, other)


# --- InputState (≙ platform input.rs semantics) -----------------------------------------

def test_input_just_pressed_lifecycle():
    s = InputState()
    s.on_key_press(KeyCode.KEY_W)
    assert s.is_key_pressed(KeyCode.KEY_W)
    assert s.is_key_just_pressed(KeyCode.KEY_W)
    s.begin_frame()
    assert s.is_key_pressed(KeyCode.KEY_W)
    assert not s.is_key_just_pressed(KeyCode.KEY_W)
    s.on_key_release(KeyCode.KEY_W)
    assert s.is_key_just_released(KeyCode.KEY_W)
    assert not s.is_key_pressed(KeyCode.KEY_W)


def test_input_press_and_release_same_frame():
    """A key pressed and released within one frame shows in both just-sets."""
    s = InputState()
    s.on_key_press(KeyCode.SPACE)
    s.on_key_release(KeyCode.SPACE)
    assert s.is_key_just_pressed(KeyCode.SPACE)
    assert s.is_key_just_released(KeyCode.SPACE)
    assert not s.is_key_pressed(KeyCode.SPACE)


def test_input_mouse_delta_accumulates_and_clears():
    s = InputState()
    s.on_mouse_move(10.0, 10.0)
    s.on_mouse_move(15.0, 12.0)
    s.on_mouse_move(18.0, 13.0)
    assert s.mouse_delta == (8.0, 3.0)
    assert s.mouse_position == (18.0, 13.0)
    s.begin_frame()
    assert s.mouse_delta == (0.0, 0.0)
    s.on_mouse_press(MouseButton.LEFT)
    assert s.is_mouse_just_pressed(MouseButton.LEFT)


# --- FrameManager ---------------------------------------------------------------------

def test_frame_manager_bounds_in_flight():
    fm = FrameManager(frames_in_flight=2)
    results = []

    def fake_frame(x):
        return jnp.asarray(x) * 2.0

    for i in range(5):
        fm.submit(fake_frame, float(i))
        assert fm.in_flight <= 2
    drained = fm.wait_for_all_frames()
    assert fm.in_flight == 0
    assert len(drained) == 2  # the last two still queued
    assert fm.frame_count == 5


def test_frame_manager_present_order():
    fm = FrameManager(frames_in_flight=2)
    fm.submit(lambda x: jnp.asarray(x), 1.0)
    fm.submit(lambda x: jnp.asarray(x), 2.0)
    assert float(fm.present_oldest()) == 1.0
    assert float(fm.present_oldest()) == 2.0
    assert fm.present_oldest() is None


def test_native_png_roundtrip(tmp_path):
    """The native PNG encoder's output decodes (via PIL) to the exact
    input pixels, for RGB and RGBA."""
    import numpy as np
    from PIL import Image

    from renderer_rs_tpu.utils.image_io import _native_png, write_png

    assert _native_png() is not None, "libimageio.so not built (make -C native)"
    rng = np.random.default_rng(7)
    for c in (3, 4):
        img = rng.integers(0, 256, (33, 57, c), np.uint8)
        p = str(tmp_path / f"t{c}.png")
        write_png(p, img)
        with open(p, "rb") as f:
            assert f.read(4) == b"\x89PNG"
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, img)
