"""coral_tpu: a TPU-native focal-amplification reconstruction engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of CoRAL
(Complete Reconstruction of Amplifications with Long reads): CN-gain interval
seeding, breakpoint-graph construction from long-read BAMs, convex CN
balancing, and cycle/path extraction, emitting AmpliconArchitect-compatible
``graph.txt`` / ``cycles.txt``.
"""
__version__ = "0.1.0"

from .config import Config, DEFAULT_CONFIG  # noqa: F401
