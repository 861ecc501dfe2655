"""Core utilities: errors, logging, timing, config.

TPU-native equivalent of the reference ``core`` crate
(crates/core/src/lib.rs:9-15: Error/Result, init_logging, Timer).
"""

from renderer_rs_tpu.core.errors import (  # noqa: F401
    ConfigError,
    InternalError,
    RendererError,
    ResourceError,
    Result,
    RhiError,
    ShaderError,
    WindowError,
)
from renderer_rs_tpu.core.logging import init_logging  # noqa: F401
from renderer_rs_tpu.core.timer import Timer  # noqa: F401
from renderer_rs_tpu.core.config import RendererConfig  # noqa: F401
