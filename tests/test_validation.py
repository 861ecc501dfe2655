"""Validation-mode tests (≙ VK_LAYER_KHRONOS_validation + debug_callback,
instance.rs:62-131 / 240-282): enable_validation routes finite-check
findings through the severity->log mapping; normal mode stays silent
(VERDICT r4 item 5: the injected-NaN test)."""

import logging

import jax.numpy as jnp
import numpy as np
import pytest

from renderer_rs_tpu.app.scenes import triangle_scene
from renderer_rs_tpu.core import validation
from renderer_rs_tpu.core.config import RendererConfig
from renderer_rs_tpu.platform.window import Window
from renderer_rs_tpu.renderer.renderer import Renderer


@pytest.fixture(autouse=True)
def _reset():
    validation.reset_findings()
    yield
    validation.reset_findings()


def _renderer(w=48, h=32, validate=False):
    window = Window(w, h, "test")
    scene, layout, kwargs, _ = triangle_scene(w, h)
    r = Renderer(
        window,
        RendererConfig(width=w, height=h, backend="cpu",
                       enable_validation=validate),
        **kwargs,
    )
    return r, scene, layout


def _poison(scene):
    """Inject a NaN vertex (the classic bad-upload the layers catch)."""
    pos = np.asarray(scene.positions).copy()
    pos[0, 0] = np.nan
    return scene.replace(positions=jnp.asarray(pos))


class _Capture(logging.Handler):
    """Explicit handler on the validation logger: caplog attaches to the
    ROOT logger, and other tests' init_logging calls stop propagation on
    the package logger — a root-level capture then sees nothing (full-
    suite-order flakiness)."""

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.records = []

    def emit(self, record):
        self.records.append(record)


@pytest.fixture
def vlog():
    log = logging.getLogger("renderer_rs_tpu.validation")
    h = _Capture()
    old_level = log.level
    log.addHandler(h)
    log.setLevel(logging.DEBUG)
    yield h
    log.removeHandler(h)
    log.setLevel(old_level)


def test_debug_callback_severity_routing(vlog):
    """Severity taxonomy maps onto logging levels like the reference's
    match arms (instance.rs:252-262)."""
    validation.debug_callback(validation.SEVERITY_ERROR,
                              validation.TYPE_VALIDATION, "e")
    validation.debug_callback(validation.SEVERITY_WARNING,
                              validation.TYPE_PERFORMANCE, "w")
    validation.debug_callback(validation.SEVERITY_VERBOSE,
                              validation.TYPE_GENERAL, "v")
    levels = [rec.levelno for rec in vlog.records]
    assert levels == [logging.ERROR, logging.WARNING, logging.DEBUG]
    assert "[PERFORMANCE] w" in vlog.records[1].getMessage()
    assert validation.findings(validation.SEVERITY_ERROR) == 1
    assert validation.findings(validation.SEVERITY_WARNING) == 1


def test_validation_catches_injected_nan_normal_mode_does_not(vlog):
    """The VERDICT item 5 acceptance test: a NaN vertex is flagged at
    set_scene under enable_validation=True and silently accepted in
    normal mode."""
    # normal mode: no finding
    r, scene, layout = _renderer()
    r.set_scene(_poison(scene), layout)
    assert validation.findings(validation.SEVERITY_ERROR) == 0

    # validation mode: ERROR finding naming the leaf
    rv, scene_v, layout_v = _renderer(validate=True)
    rv.set_scene(_poison(scene_v), layout_v)
    assert validation.findings(validation.SEVERITY_ERROR) == 1
    errs = [r for r in vlog.records if r.levelno == logging.ERROR]
    msg = errs[-1].getMessage()
    assert "positions" in msg and "non-finite" in msg


def test_validation_mode_renders_eagerly():
    """enable_validation runs the frame jit-disabled (stage boundaries are
    real values) and still produces the same image as a compiled render."""
    r, scene, layout = _renderer()
    r.set_scene(scene, layout)
    ref = None
    for _ in range(3):
        ref = r.render_frame()

    rv, scene_v, layout_v = _renderer(validate=True)
    rv.set_scene(scene_v, layout_v)
    out = None
    for _ in range(3):
        out = rv.render_frame()
    assert out is not None
    np.testing.assert_array_equal(out, ref)
    # a clean frame reports no errors
    assert validation.findings(validation.SEVERITY_ERROR) == 0


def test_frame_output_validation_flags_nan():
    bad = np.ones((4, 4, 4), np.float32)
    bad[1, 2, 0] = np.inf
    assert validation.validate_frame_output(bad) == 1
    assert validation.findings(validation.SEVERITY_ERROR) == 1
    assert validation.validate_frame_output(np.zeros((2, 2, 4))) == 0
