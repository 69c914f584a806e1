"""Persistent JAX compilation cache management.

Accelerator compiles are the single largest latency cliff in this
pipeline (remote axon backend: 48–271 s per program shape, measured
round 5; directly-attached TPUs: ~20–40 s).  The kernels already bucket
their shapes to powers of two so a pipeline pays a bounded number of
compiles per process (``ops.pallas_kernels._bucket_rows``); this module
adds the cross-process layer: JAX's persistent compilation cache, so
backends that support executable serialization pay each shape once per
MACHINE instead of once per process.

Measured support (round 5, this environment):

* CPU backend — works (entries written, second process hits).
* axon remote TPU — NOT served: the cache directory stays empty after a
  270 s compile and a second process recompiles (38 s, amortized on the
  server side, still far too slow to sit on a latency-sensitive path).
  This is why engine routing (:mod:`coral_tpu.ops.routing`) prices a
  cold compile into the route decision instead of assuming the cache
  makes first dispatches cheap.

Environment knobs: ``CORAL_TPU_JAX_CACHE_DIR`` overrides the default
``~/.cache/coral_tpu/jax_cache``; ``CORAL_TPU_NO_COMPILE_CACHE=1``
disables enablement entirely.

Reference contrast: none (no device, no compiles in the reference).
"""
from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_enabled: Optional[Path] = None


def cache_dir() -> Path:
    env = os.environ.get("CORAL_TPU_JAX_CACHE_DIR")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "coral_tpu" / "jax_cache"


def enable_persistent_cache(path: Optional[os.PathLike] = None) -> Optional[Path]:
    """Point JAX's compilation cache at a persistent directory (idempotent;
    returns the directory, or None when disabled/failed).

    Called lazily from the device-engine routes (``ops.routing.decide``,
    ``ops.pairs.score_pairs_l``) so host-only runs never touch global JAX
    config."""
    global _enabled
    if _enabled is not None:
        return _enabled
    if os.environ.get("CORAL_TPU_NO_COMPILE_CACHE") == "1":
        return None
    p = Path(path) if path is not None else cache_dir()
    try:
        p.mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", str(p))
        # cache every entry that took a nontrivial compile, regardless of
        # serialized size (the default 2 s floor skips mid-size programs
        # that still cost seconds on every process start)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = p
        logger.info("persistent compilation cache at %s", p)
        return p
    except Exception as exc:  # pragma: no cover - config drift
        logger.warning("could not enable persistent compilation cache: %s",
                       exc)
        return None
