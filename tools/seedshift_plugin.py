"""Throwaway pytest plugin: shift every random.Random(int) seed by
SEED_OFFSET, turning the committed fixed-seed differential harnesses
into fresh-randomness sweeps (both sides of each differential see the
same shifted stream)."""
import os
import random

_off = int(os.environ.get("SEED_OFFSET", "0"))
if _off:
    _orig = random.Random

    class _Shifted(_orig):
        def __init__(self, seed=None):
            if isinstance(seed, int):
                seed = seed + _off
            _orig.__init__(self, seed)

    random.Random = _Shifted
