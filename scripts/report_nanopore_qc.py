#!/usr/bin/env python3
"""Nanopore FASTQ quality-control report.

Histograms of per-read length and mean base quality, plus a quartile
summary table — the upstream QC step of the pipeline (equivalent of the
reference's ``scripts/report_nanopore_qc.py``, reimplemented without
pysam/seaborn: gzip FASTQ parsing is ~20 lines and numpy's histogram is
all the plotting needs).

Usage: report_nanopore_qc.py --fastq READS.fastq[.gz] --output_dir DIR
"""
from __future__ import annotations

import argparse
import gzip
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

_QUAL_LUT = np.arange(256, dtype=np.int32) - 33


def iter_fastq(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fp:
        while True:
            header = fp.readline()
            if not header:
                return
            seq = fp.readline().rstrip()
            fp.readline()  # '+'
            qual = fp.readline().rstrip()
            yield seq, qual


def summarize_quality_control(fastq_file: str, output_dir: str,
                              verbose: bool = False) -> None:
    os.makedirs(output_dir, exist_ok=True)
    lengths = []
    mean_quals = []
    for i, (seq, qual) in enumerate(iter_fastq(fastq_file)):
        if seq:
            lengths.append(len(seq))
            q = _QUAL_LUT[np.frombuffer(qual, np.uint8)]
            mean_quals.append(float(q.mean()))
        if verbose and (i + 1) % 1_000_000 == 0:
            print(f"Processed {i + 1} records.")
    lengths = np.asarray(lengths)
    mean_quals = np.asarray(mean_quals)

    for data, label, fn in [
        (lengths, "Mean Sequence Length", "mean_length_histogram.png"),
        (mean_quals, "Mean Sequence Quality", "mean_sequence_quality_histogram.png"),
    ]:
        plt.figure(figsize=(10, 5))
        plt.hist(data, bins=100, color="steelblue")
        plt.xlabel(label)
        plt.ylabel("Frequency")
        plt.title(f"{label} of Nanopore Sequences (mean = {data.mean():.2f})")
        plt.savefig(os.path.join(output_dir, fn), dpi=300)
        plt.close()

    with open(os.path.join(output_dir, "qc_summary.tsv"), "w") as fp:
        fp.write("metric\tQ25\tQ50\tQ75\tmean\tn\n")
        for name, data in [("length", lengths), ("mean_quality", mean_quals)]:
            q25, q50, q75 = np.percentile(data, [25, 50, 75])
            fp.write(f"{name}\t{q25:.2f}\t{q50:.2f}\t{q75:.2f}\t"
                     f"{data.mean():.2f}\t{len(data)}\n")
    print(f"Wrote QC report to {output_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fastq", required=True, help="Input FASTQ (optionally .gz)")
    ap.add_argument("--output_dir", required=True, help="Output directory")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    summarize_quality_control(args.fastq, args.output_dir, args.verbose)
