"""AOT executable cache: skip trace+lower on warm serving boots.

The persistent XLA compile cache (``~/.cache/jax_ragroute``) removes
the COMPILE cost of a warm boot but not the trace+lower cost — the
cache key is computed FROM the lowered program, so ~95 s of host-side
tracing/lowering (BENCHMARKS.md boot table) runs every boot just to
discover the cache hit. This module removes that too: the COMPILED
executable is serialized to disk
(``jax.experimental.serialize_executable``) under a key derived from
things known BEFORE tracing — the package source fingerprint, jax
version, backend + device kind, the argument avals, and a caller tag —
the same fingerprint discipline the LLM weight-conversion cache uses.
A warm boot deserializes and runs; nothing is retraced.

Correctness: any source edit anywhere in ``ragroute_tpu``/``bench.py``
changes the fingerprint and forces a fresh compile (over-invalidation
by design — the aval+source key cannot see WHICH function changed).
Deserialization failures (backend upgrade, driver change) fall back to
the normal jit path and overwrite the entry.

MEASURED REFUTATION on this backend (round 5, v5e via the axon
tunnel, bench point B=2048/1M-doc bf16, same session back-to-back):
the mechanism works — deserialize_and_load returns in 0.1 s with zero
tracing — but the FIRST EXECUTION of the deserialized executable took
296.6 s vs 129.7 s for the classic jit path (trace+lower+persistent-
cache hit+execute) on identical inputs. The remote axon backend
evidently reprocesses a client-shipped serialized executable far more
expensively than its own persistent-cache hit, so skipping trace+lower
(the only cost AOT removes) LOSES 167 s net here. Default is therefore
OFF (``RAGROUTE_AOT=1`` opts in — the right default on a local-attach
TPU host, where executable load is a local protobuf read). The boot
table in BENCHMARKS.md records both numbers.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import time
from typing import Optional

logger = logging.getLogger("aot")
if not logger.handlers:
    # boots are where this module matters and they are exactly where
    # nobody has configured logging yet — one stderr line per decision
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("aot: %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    logger.propagate = False

_FP_CACHE: Optional[str] = None


def source_fingerprint() -> str:
    """sha256 over every .py file of the package (+ bench.py)."""
    global _FP_CACHE
    if _FP_CACHE is not None:
        return _FP_CACHE
    import ragroute_tpu

    pkg = os.path.dirname(os.path.abspath(ragroute_tpu.__file__))
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(pkg)):
        for fn in sorted(files):
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                h.update(p.encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    bench = os.path.join(os.path.dirname(pkg), "bench.py")
    if os.path.exists(bench):
        with open(bench, "rb") as f:
            h.update(f.read())
    _FP_CACHE = h.hexdigest()[:16]
    return _FP_CACHE


def _avals_key(args, kwargs) -> str:
    import jax

    leaves, treedef = jax.tree.flatten((args, kwargs))
    parts = [str(treedef)]
    for leaf in leaves:
        aval = jax.api_util.shaped_abstractify(leaf)
        parts.append(str(aval))
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def cache_dir() -> str:
    d = os.environ.get(
        "RAGROUTE_AOT_CACHE",
        os.path.expanduser("~/.cache/ragroute_aot"))
    os.makedirs(d, exist_ok=True)
    return d


def load_or_compile(tag: str, jitted, *args, key_extra: str = "",
                    **kwargs):
    """Return a ``Compiled`` for ``jitted(*args, **kwargs)``.

    Warm path: deserialize the executable from disk (no trace, no
    lower). Cold path: ``jitted.lower(...).compile()``, then serialize.
    ``jitted`` must be a ``jax.jit``-wrapped callable without static
    args bound at call time (bind them via functools.partial +
    ``static_argnames`` before jitting, or fold into ``key_extra``).

    ``RAGROUTE_AOT=1`` opts in (default OFF: measured 2.3x slower than
    the classic path through the axon tunnel, module docstring).
    """
    import jax

    if os.environ.get("RAGROUTE_AOT", "0") != "1":
        return jitted.lower(*args, **kwargs).compile()

    backend = jax.default_backend()
    dev = jax.devices()[0]
    key = hashlib.sha256("|".join([
        tag, source_fingerprint(), jax.__version__, backend,
        getattr(dev, "device_kind", str(dev)),
        str(jax.device_count()), _avals_key(args, kwargs), key_extra,
    ]).encode()).hexdigest()[:24]
    path = os.path.join(cache_dir(), f"{tag}-{key}.aot")

    if os.path.exists(path):
        try:
            from jax.experimental.serialize_executable import \
                deserialize_and_load

            t0 = time.time()
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            logger.info("aot hit %s (%.1f MB) in %.1fs", path,
                        len(payload) / 1e6, time.time() - t0)
            return compiled
        except Exception as e:
            logger.warning("aot cache %s unusable (%r); recompiling",
                           path, e)
    t0 = time.time()
    compiled = jitted.lower(*args, **kwargs).compile()
    try:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        logger.info("aot compiled %s in %.1fs (saved %.1f MB)", tag,
                    time.time() - t0, len(payload) / 1e6)
    except Exception as e:
        logger.warning("aot serialize failed for %s (%r); executable "
                       "not cached", tag, e)
    return compiled
