"""VPU tile-layout constants + shape bucketing — dependency-free.

Shared by the Pallas kernels (:mod:`.pallas_kernels`) and the engine
router (:mod:`.routing`).  Lives in its own module because importing
``jax.experimental.pallas`` costs ~1.2 s of module loading (measured
round 5) — a HOST-routed engine decision that only needs the bucket
arithmetic must not pay it.
"""
from __future__ import annotations

LANES = 128      # VPU lane count (v4/v5 vector unit is 8 x 128)
SUBLANES = 8


def _bucket_rows(n: int) -> int:
    """Row count for n pairs, bucketed to a power of two so a pipeline
    with varying pair counts pays at most ~20 kernel compiles ever (each
    new shape costs 20 s-5 min on a remote backend); zero padding is
    inert in the packed layout (meta 0 decodes to chrom -1, which
    matches no interval)."""
    rows = max(-(-n // LANES), SUBLANES)
    return 1 << (rows - 1).bit_length()
