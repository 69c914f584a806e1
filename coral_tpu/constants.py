"""Reference-genome constants shared across the engine.

Semantics mirror the reference CoRAL's global tables
(``/root/reference/src/global_names.py:9-25``): the canonical hg38 chromosome
ordering (chr1..chr22, chrX, chrY, chrM), hg38 chromosome sizes, and the
strand-flip map.  Re-expressed here as immutable data plus numpy-friendly
helpers so device code can work with integer chromosome codes throughout.
"""
from __future__ import annotations

# Canonical chromosome order (hg38).  chrM sorts last.
CHR_NAMES = tuple(
    [f"chr{i}" for i in range(1, 23)] + ["chrX", "chrY", "chrM"]
)

# chromosome name -> canonical index (0..24)
CHR_IDX = {name: i for i, name in enumerate(CHR_NAMES)}

# hg38 chromosome sizes (chrM intentionally absent, as in the reference).
CHR_SIZES = {
    "chr1": 248956422, "chr2": 242193529, "chr3": 198295559, "chr4": 190214555,
    "chr5": 181538259, "chr6": 170805979, "chr7": 159345973, "chr8": 145138636,
    "chr9": 138394717, "chr10": 133797422, "chr11": 135086622, "chr12": 133275309,
    "chr13": 114364328, "chr14": 107043718, "chr15": 101991189, "chr16": 90338345,
    "chr17": 83257441, "chr18": 80373285, "chr19": 58617616, "chr20": 64444167,
    "chr21": 46709983, "chr22": 50818468, "chrX": 156040895, "chrY": 57227415,
}

# strand -> opposite strand
FLIP_STRAND = {"+": "-", "-": "+"}


def chrom_key(name: str) -> int:
    """Canonical sort key for a chromosome name.

    Known names sort by CHR_IDX; unknown names sort after, by a stable
    numeric/ordinal key (mirrors ``breakpoint_utilities.sort_chrom_names``,
    reference ``src/breakpoint_utilities.py:419-427``).
    """
    if name in CHR_IDX:
        return CHR_IDX[name]
    val = name[3:] if name.startswith("chr") else name
    return 1000 + (int(val) if val.isnumeric() else ord(val[0]))


def sort_chrom_names(chromlist):
    """Sort chromosome names numerically then lexically (ref :419-427)."""
    def key(x):
        val = x[3:] if x.startswith("chr") else x
        return int(val) if val.isnumeric() else ord(val[0])
    return sorted(chromlist, key=key)
