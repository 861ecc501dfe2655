"""Logging init with env-filter semantics.

Mirrors crates/core/src/logging.rs:16-24: a registry with an env-driven filter
(`RUST_LOG`-style), default ``info,renderer=debug``, and target + thread-id in
the output format. Here the env var is ``RENDERER_LOG`` (falls back to
``RUST_LOG`` so reference muscle-memory works), and "targets" are Python
logger names under the ``renderer_rs_tpu`` namespace.
"""

from __future__ import annotations

import logging
import os
import threading

_DEFAULT_FILTER = "info,renderer_rs_tpu=debug"

_LEVELS = {
    "trace": logging.DEBUG,  # python has no TRACE; map to DEBUG
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}

_initialized = False
_lock = threading.Lock()


class _ThreadTargetFormatter(logging.Formatter):
    """Format ≙ tracing-subscriber's target + thread-id layout (logging.rs:19-22)."""

    def format(self, record: logging.LogRecord) -> str:
        record.thread_id = threading.get_ident() % 100000
        return super().format(record)


def parse_env_filter(spec: str) -> tuple[int, dict[str, int]]:
    """Parse a ``RUST_LOG``-style filter: ``level[,target=level]...``.

    Returns (default_level, {target: level}). Unknown levels are ignored.
    """
    default = logging.INFO
    per_target: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            target, _, lvl = part.partition("=")
            level = _LEVELS.get(lvl.strip().lower())
            if level is not None:
                per_target[target.strip()] = level
        else:
            level = _LEVELS.get(part.lower())
            if level is not None:
                default = level
    return default, per_target


def init_logging(filter_spec: str | None = None) -> None:
    """Initialize process-wide logging (≙ core::init_logging, logging.rs:16-24).

    Idempotent. Filter resolution order: explicit arg > $RENDERER_LOG >
    $RUST_LOG > default ``info,renderer_rs_tpu=debug``.
    """
    global _initialized
    with _lock:
        if _initialized:
            return
        spec = (
            filter_spec
            or os.environ.get("RENDERER_LOG")
            or os.environ.get("RUST_LOG")
            or _DEFAULT_FILTER
        )
        default, per_target = parse_env_filter(spec)

        handler = logging.StreamHandler()
        handler.setFormatter(
            _ThreadTargetFormatter(
                "%(asctime)s %(levelname)5s %(name)s [tid %(thread_id)s]: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        # Attach to the package logger rather than the root logger so that
        # libraries with their own handlers (jax) don't double-print.
        pkg = logging.getLogger("renderer_rs_tpu")
        pkg.addHandler(handler)
        pkg.propagate = False
        pkg.setLevel(default)
        for target, level in per_target.items():
            logging.getLogger(target).setLevel(level)
        _initialized = True


def get_logger(name: str) -> logging.Logger:
    """Namespaced logger (≙ a tracing target)."""
    return logging.getLogger(name)
