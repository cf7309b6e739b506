"""Tracing/profiling subsystem (SURVEY.md §5.1).

The reference has only wall-clock progress prints (tagging.py:342-351). Here:
  - ``trace(dir)`` wraps a region in a jax.profiler trace (viewable in
    TensorBoard / Perfetto) when profiling is enabled;
  - ``annotate(name)`` adds named regions to the trace;
  - throughput counters live in utils/progress.py (``ProgressMeter``).

Enable with the CLI ``--profile DIR`` flags or ``AIIS_PROFILE_DIR`` env var.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


def profile_dir() -> Optional[str]:
    return os.environ.get("AIIS_PROFILE_DIR") or None


@contextlib.contextmanager
def trace(directory: Optional[str] = None) -> Iterator[None]:
    """Capture a device+host profiler trace into ``directory`` (no-op when None).

    Profiler failures never break the run, but exceptions raised by the WRAPPED
    BODY must propagate untouched — a catch-all around the yield would swallow
    them into contextlib's "generator didn't stop after throw()" and bury the
    real traceback."""
    directory = directory or profile_dir()
    if not directory:
        yield
        return
    import jax

    prof = None
    try:
        os.makedirs(directory, exist_ok=True)
        prof = jax.profiler.trace(directory)
        prof.__enter__()
    except Exception as e:  # noqa: BLE001 — profiler start failure only
        print(f"profiling unavailable: {e}")
        prof = None
    try:
        yield
    finally:
        if prof is not None:
            try:
                prof.__exit__(None, None, None)
                print(f"profiler trace written to {directory}")
            except Exception as e:  # noqa: BLE001
                print(f"profiler finalize failed: {e}")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside an active trace (TraceAnnotation)."""
    try:
        import jax

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:  # noqa: BLE001
        yield
