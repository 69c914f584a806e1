"""pysam- and intervaltree-compatible facades over the native BAM core.

Two consumers:

* downstream tooling written against ``pysam.AlignmentFile`` can run on
  coral_tpu's scanner without htslib installed;
* the end-to-end differential test (``tests/test_reference_e2e.py``)
  injects these facades as ``sys.modules['pysam']`` /
  ``sys.modules['intervaltree']`` and executes the REFERENCE's own
  ``reconstruct_graph`` on coral_tpu's BAM engine, comparing outputs
  file-for-file with ours.

Scope is exactly the surface the reference consumes
(``infer_breakpoint_graph.py``, ``hsr.py``, ``plot_amplicons.py``):
``fetch`` (whole-file and region), ``count_coverage``,
per-read ``query_name/flag/query_length/mapping_quality/
reference_name/reference_start/reference_end``, ``get_tag``/``has_tag``
for SA, ``get_cigar_stats`` (NM slot only), ``get_blocks``,
``infer_read_length``.

Deliberate deviations (documented, invisible to reference call sites):

* ``count_coverage`` returns the aggregate per-base profile in the A row
  and zeros in C/G/T — the scanner does not retain base identities, and
  every reference call site consumes only ``sum over the four rows``
  (``infer_breakpoint_graph.py:131,834-835,1033-1034``,
  ``plot_amplicons.py:399,408``).
* ``get_cigar_stats`` fills only the NM slot (index 10 of the first
  array); the reference reads only ``[0][-1]``
  (``infer_breakpoint_graph.py:154``).
* The facade runs on the native scan backend (C++ coverage kernels);
  ``get_blocks`` needs per-record CIGAR decode, which the native table
  does not retain, so a python-backend shadow of the same BAM is opened
  lazily on first ``get_blocks`` call.
"""
from __future__ import annotations

from typing import Iterator, List, NamedTuple, Optional, Tuple

import numpy as np

from .bam import FLAG_EXCLUDE_ALL, BamFile


class AlignedSegmentView:
    """Lazy pysam.AlignedSegment-alike over one flat-table row."""

    __slots__ = ("_af", "_bam", "_i", "_rec")

    def __init__(self, af: "AlignmentFile", i: int):
        self._af = af
        self._bam = af._bam
        self._i = i
        self._rec = None

    # -- flat-column attributes (no decode) -------------------------------

    @property
    def query_name(self) -> str:
        return self._bam.name(self._i)

    @property
    def flag(self) -> int:
        return int(self._bam.flag[self._i])

    @property
    def mapping_quality(self) -> int:
        return int(self._bam.mapq[self._i])

    @property
    def mapq(self) -> int:
        """pysam legacy alias (used at infer_breakpoint_graph.py:1308)."""
        return int(self._bam.mapq[self._i])

    @property
    def query_length(self) -> int:
        return int(self._bam.qlen[self._i])

    @property
    def reference_name(self) -> str:
        return self._bam.references[int(self._bam.ref_id[self._i])][0]

    @property
    def reference_start(self) -> int:
        return int(self._bam.pos[self._i])

    @property
    def reference_end(self) -> int:
        return int(self._bam.end[self._i])

    def infer_read_length(self):
        """pysam infers from the CIGAR (query-consuming ops), returning
        None when the record has no CIGAR — so for MAPPED records it is
        always truthy even when SEQ is omitted.  The reference uses it
        only as a truthiness gate (infer_breakpoint_graph.py:1031); return
        the SEQ length when stored, else 1 for mapped records (every
        mapped record carries a CIGAR), else None."""
        if int(self._bam.flag[self._i]) & 0x4:
            return None
        return int(self._bam.qlen[self._i]) or 1

    def has_tag(self, tag: str) -> bool:
        if tag[:2] == "SA":
            return self._bam.sa_tag(self._i) is not None
        if tag[:2] == "NM":
            return True
        return False

    def get_tag(self, tag: str):
        """pysam resolves a tag by its first two characters (the reference
        passes 'SA:Z:', ``infer_breakpoint_graph.py:145``)."""
        if tag[:2] == "SA":
            sa = self._bam.sa_tag(self._i)
            if sa is not None:
                return sa
        elif tag[:2] == "NM":
            return int(self._bam.nm[self._i])
        raise KeyError(f"tag {tag!r} not present")

    def get_cigar_stats(self):
        """Only the NM slot ([0][-1]) is populated — the single field the
        reference reads (``infer_breakpoint_graph.py:154``)."""
        return [0] * 10 + [int(self._bam.nm[self._i])], None

    def get_blocks(self) -> List[Tuple[int, int]]:
        if self._rec is None:
            dec = self._af._decoder_bam()
            buf = memoryview(dec._payload)
            self._rec = dec._decode_at(buf, self._i)
        return self._rec.blocks()


class AlignmentFile:
    """pysam.AlignmentFile facade (read-only, coordinate-sorted BAM)."""

    def __init__(self, path: str, mode: str = "rb", backend: str = "auto"):
        if "r" not in mode:
            raise ValueError("facade is read-only")
        self._bam = BamFile(path, backend=backend)
        self._decoder = self._bam if self._bam.backend == "python" else None

    def _decoder_bam(self) -> BamFile:
        """Python-backend shadow for per-record CIGAR decode; the scans
        produce identical tables (covered by the native-vs-python
        differential tests), so row indices are interchangeable."""
        if self._decoder is None:
            self._decoder = BamFile(self._bam.path, backend="python")
        return self._decoder

    @property
    def references(self) -> List[str]:
        return [name for name, _l in self._bam.references]

    @property
    def lengths(self) -> List[int]:
        return [l for _name, l in self._bam.references]

    def fetch(self, contig: Optional[str] = None, start: Optional[int] = None,
              stop: Optional[int] = None, **_kw) -> Iterator[AlignedSegmentView]:
        if contig is None:
            for i in range(self._bam.n_records):
                yield AlignedSegmentView(self, i)
            return
        if start is None:
            start = 0
        if stop is None:
            stop = 1 << 62
        for i in self._bam.overlap(contig, int(start), int(stop)):
            yield AlignedSegmentView(self, int(i))

    def count_coverage(self, contig: str, start: Optional[int] = None,
                       stop: Optional[int] = None,
                       quality_threshold: int = 15,
                       read_callback: str = "all"):
        """Aggregate base coverage in the A row (see module docstring);
        pysam defaults preserved: base quality >= 15, 'all' read filter
        (unmapped/secondary/qcfail/dup excluded)."""
        if start is None:
            start = 0
        if stop is None:
            stop = dict(self._bam.references)[contig]
        flag_exclude = FLAG_EXCLUDE_ALL if read_callback == "all" else 0
        prof = self._bam.coverage_profile(
            contig, int(start), int(stop),
            quality_threshold=int(quality_threshold or 0),
            flag_exclude=flag_exclude)
        zero = np.zeros_like(prof)
        return prof, zero, zero.copy(), zero.copy()

    def close(self) -> None:
        self._bam.close()
        if self._decoder is not None and self._decoder is not self._bam:
            self._decoder.close()


# --------------------------------------------------------------------------
# intervaltree facade (the reference uses construction by slice-assignment
# and point queries only: infer_breakpoint_graph.py:88-91,177-178)
# --------------------------------------------------------------------------

class Interval(NamedTuple):
    begin: int
    end: int
    data: object


class IntervalTree:
    """Sorted-list interval set with the intervaltree query surface the
    reference touches: ``tree[a:b] = data`` and ``tree[point]`` /
    ``tree[a:b]`` returning a set of half-open Intervals."""

    def __init__(self, intervals=()):
        self._iv: List[Interval] = list(intervals)

    def addi(self, begin: int, end: int, data=None) -> None:
        if begin >= end:
            raise ValueError("null interval")
        self._iv.append(Interval(begin, end, data))

    def __setitem__(self, key: slice, value) -> None:
        self.addi(int(key.start), int(key.stop), value)

    def __getitem__(self, key):
        if isinstance(key, slice):
            a, b = int(key.start), int(key.stop)
            return {iv for iv in self._iv if iv.begin < b and iv.end > a}
        p = int(key)
        return {iv for iv in self._iv if iv.begin <= p < iv.end}

    def __len__(self) -> int:
        return len(self._iv)

    def __iter__(self):
        return iter(self._iv)
