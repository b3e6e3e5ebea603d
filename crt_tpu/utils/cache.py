"""Persistent XLA compilation cache.

First compilation of the full render program costs 10-130 s (worse through
a remote-compile relay).  Enabling jax's persistent cache makes every CLI /
bench / test process after the first reuse compiled executables from disk.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("CRT_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — harmless
