"""Persistent XLA/Mosaic compilation cache.

Kernel compiles on the remote-TPU backend take minutes (see
CLAUDE.md/utils.precision notes); every entry point enables the on-disk
compile cache so repeated serving/bench runs skip them.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str = "~/.cache/jax_ragroute") -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # older jax without these options
        pass
