"""Native (C++) acceleration layer, loaded via ctypes.

Build with ``make -C coral_tpu/native`` (requires g++ and zlib).  All
entry points have pure-Python fallbacks in ``coral_tpu.io``; the native
layer only changes speed, never results.
"""
