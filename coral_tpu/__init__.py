"""coral_tpu: a TPU-native focal-amplification reconstruction engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of CoRAL
(Complete Reconstruction of Amplifications with Long reads): CN-gain interval
seeding, breakpoint-graph construction from long-read BAMs, convex CN
balancing, and cycle/path extraction, emitting AmpliconArchitect-compatible
``graph.txt`` / ``cycles.txt``.
"""
__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large freed allocations in the glibc arena instead of
    returning them to the OS.

    By default glibc serves allocations above ~128 KB with mmap and
    unmaps them on free, so every pipeline stage's large numpy
    temporaries are FRESH pages — and on virtualized hosts first-touch
    page faults dominate large-allocation cost (measured here:
    ~38 s/GB cold; the junction-heavy reconstruct re-paid the tax in
    every stage).  Raising M_MMAP_THRESHOLD and disabling trim keeps
    the pages mapped and reused: measured min-of-3 on the 1.5M-pair
    junction-heavy shape dropped 12.1 s → 10.8 s (round 5).  Trade-off:
    peak RSS is retained until process exit — right for a pipeline
    process, opt out with ``CORAL_TPU_NO_MALLOC_TUNING=1`` (and any
    explicit ``MALLOC_*`` environment tuning is left untouched)."""
    import ctypes
    import os
    import sys

    if os.environ.get("CORAL_TPU_NO_MALLOC_TUNING") == "1":
        return
    if any(k.startswith("MALLOC_") for k in os.environ):
        return
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:  # non-glibc libc: fine, this is an optimization
        pass


_tune_malloc()

from .config import Config, DEFAULT_CONFIG  # noqa: F401, E402
