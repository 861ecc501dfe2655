"""Validation-layer analog (≙ VK_LAYER_KHRONOS_validation + debug_callback).

The reference enables the Khronos validation layer in debug builds
(instance.rs:62-131) and routes driver findings through a severity-tagged
debug messenger (debug_callback, instance.rs:240-282) into its logging
scheme. A TPU pipeline has no driver layer to interpose, but it has the
same failure class the layers exist to catch: garbage state flowing in
(NaN vertices, non-finite transforms, out-of-range material constants)
and garbage flowing out (NaN framebuffer texels) with no eager boundary
to notice, because everything between scene bind and readback is one
fused XLA program.

The analog, switched by ``RendererConfig.enable_validation``:

1. **Bind-time state validation** — every scene pytree leaf is checked
   finite at ``set_scene`` (the descriptor-data analog of the layers
   validating buffer contents at bind).
2. **Eager frame execution** — the frame runs under ``jax.disable_jit()``
   so stage boundaries are real values (≙ the layers interposing each
   API call; costs ~the layers' overhead too — on the TPU tunnel backend
   every eager op pays the remote hop, so validation mode is a CPU-
   backend debugging tool, exactly like running under the layers).
3. **Frame-output validation** — the presented color product is checked
   for NaN/Inf after every frame.

Findings route through :func:`debug_callback`, which maps the Vulkan
severity taxonomy onto Python logging levels the same way
instance.rs:240-282 maps ``ERROR/WARNING/INFO/VERBOSE`` onto
``error!/warn!/info!/trace!``, and increments a counter the tests (and a
CI gate) can read. Nothing raises: validation REPORTS, the program keeps
running — matching layer semantics.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("renderer_rs_tpu.validation")

# Vulkan severity taxonomy (instance.rs:252-262 match arms).
SEVERITY_ERROR = "ERROR"
SEVERITY_WARNING = "WARNING"
SEVERITY_INFO = "INFO"
SEVERITY_VERBOSE = "VERBOSE"

_LEVELS = {
    SEVERITY_ERROR: logging.ERROR,
    SEVERITY_WARNING: logging.WARNING,
    SEVERITY_INFO: logging.INFO,
    SEVERITY_VERBOSE: logging.DEBUG,
}

# message_type analog (instance.rs:264-268): what subsystem flagged it.
TYPE_VALIDATION = "VALIDATION"
TYPE_GENERAL = "GENERAL"
TYPE_PERFORMANCE = "PERFORMANCE"

_counters = {SEVERITY_ERROR: 0, SEVERITY_WARNING: 0, SEVERITY_INFO: 0,
             SEVERITY_VERBOSE: 0}


def debug_callback(severity: str, message_type: str, message: str) -> None:
    """Route one finding through the logging severity scheme
    (≙ debug_callback, instance.rs:240-282: severity → log macro,
    message_type tag in the line)."""
    _counters[severity] = _counters.get(severity, 0) + 1
    log.log(_LEVELS.get(severity, logging.WARNING),
            "[%s] %s", message_type, message)


def findings(severity: str = SEVERITY_ERROR) -> int:
    """Count of findings reported at `severity` since the last reset."""
    return _counters.get(severity, 0)


def reset_findings() -> None:
    for k in _counters:
        _counters[k] = 0


def _leaf_label(path) -> str:
    import jax

    return "scene" + jax.tree_util.keystr(path)


def validate_scene(scene, layout) -> int:
    """Bind-time state validation: every pytree leaf must be finite.

    Returns the number of ERROR findings (also routed through
    debug_callback). The finite sweep is one host pass over the leaves —
    set_scene is a cold path, so this is the right place to pay it."""
    import jax

    errors = 0
    flat, _ = jax.tree_util.tree_flatten_with_path(scene)
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        bad = ~np.isfinite(arr)
        if bad.any():
            errors += 1
            idx = np.argwhere(bad)[0]
            debug_callback(
                SEVERITY_ERROR, TYPE_VALIDATION,
                f"non-finite value in {_leaf_label(path)} "
                f"shape={arr.shape} first at {tuple(int(i) for i in idx)} "
                f"({int(bad.sum())} total)",
            )
    if errors == 0:
        debug_callback(
            SEVERITY_VERBOSE, TYPE_VALIDATION,
            f"scene state validated: {len(flat)} leaves finite "
            f"({layout.num_triangles} tris, {layout.num_objects} objects)",
        )
    return errors


def validate_frame_output(color) -> int:
    """Frame-product validation: NaN/Inf texels in the color output.

    Forces a device sync (np.asarray) — validation mode is synchronous by
    design, like frames under the validation layers."""
    arr = np.asarray(color)
    bad = ~np.isfinite(arr)
    n = int(bad.sum())
    if n:
        debug_callback(
            SEVERITY_ERROR, TYPE_VALIDATION,
            f"non-finite framebuffer texels: {n} of {arr.size} "
            f"(first flat index {int(np.argwhere(bad.ravel())[0][0])})",
        )
        return 1
    return 0
