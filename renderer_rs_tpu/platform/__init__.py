"""platform — windowing, surface, input (TPU-native equivalent of crates/platform).

There is no display server in the target environment; the ``Window`` is a
headless surface whose "present" writes PNG frames (≙ WSI present becoming a
device→host framebuffer readback, SURVEY.md §2.9). The InputState semantics
are ported exactly (platform/src/input.rs:28-146) so camera controllers
behave identically.
"""

from renderer_rs_tpu.platform.window import Surface, Window  # noqa: F401
from renderer_rs_tpu.platform.input import InputState, KeyCode, MouseButton  # noqa: F401
