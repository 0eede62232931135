"""Profiling hooks (reference zenith-core/src/profile.rs:1-4 + the
``#[profiling::function]`` annotations sprinkled across the reference).

The reference ships a no-op puffin stub; here profiling is real when enabled:
``initialize(trace_dir=...)`` starts a ``jax.profiler`` trace (viewable in
TensorBoard / Perfetto), and ``scope(name)`` / ``@profiled`` annotate host
spans with ``jax.profiler.TraceAnnotation`` so graph build / compile / submit
phases show up alongside the XLA device timeline.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Callable, Iterator

_active_trace_dir: str | None = None


def initialize(trace_dir: str | None = None) -> None:
    """Start profiling. No-op unless ``trace_dir`` is given (reference
    profile.rs disables puffin the same way)."""
    global _active_trace_dir
    if trace_dir is None:
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    _active_trace_dir = trace_dir


def shutdown() -> None:
    global _active_trace_dir
    if _active_trace_dir is not None:
        import jax

        jax.profiler.stop_trace()
        _active_trace_dir = None


@contextlib.contextmanager
def scope(name: str) -> Iterator[None]:
    """Named host-side span (analog of ``profiling::scope!``)."""
    if _active_trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def profiled(fn: Callable[..., Any]) -> Callable[..., Any]:
    """Decorator analog of ``#[profiling::function]``."""

    @functools.wraps(fn)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        with scope(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapper
