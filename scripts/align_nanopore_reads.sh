#!/usr/bin/env bash
# Align nanopore reads with Winnowmap2 (k=15 repetitive-kmer masking),
# filter to mapq >= 25 and read length > 1 kb, coordinate-sort and index —
# the upstream alignment recipe coral_tpu reconstruct expects.
#
# Usage: align_nanopore_reads.sh FASTQ GENOME_FA OUTPUT_DIR THREADS
set -euo pipefail

FASTQ=${1:?usage: align_nanopore_reads.sh FASTQ GENOME_FA OUTPUT_DIR THREADS}
GENOME_REF=${2:?missing genome fasta}
OUTPUT_DIR=${3:?missing output dir}
THREADS=${4:-8}

MIN_MAPQ=25
MIN_LENGTH=1000
mkdir -p "$OUTPUT_DIR"

if [ ! -s "$OUTPUT_DIR/repetitive_k15.txt" ]; then
    echo "Building k=15 repetitive-kmer list..."
    meryl count k=15 output "$OUTPUT_DIR/merylDB" "$GENOME_REF" threads="$THREADS"
    meryl print greater-than distinct=0.9998 "$OUTPUT_DIR/merylDB" \
        > "$OUTPUT_DIR/repetitive_k15.txt"
fi

echo "Aligning with Winnowmap2..."
winnowmap -W "$OUTPUT_DIR/repetitive_k15.txt" -t "$THREADS" \
    -ax map-ont "$GENOME_REF" "$FASTQ" \
  | samtools view -h - \
  | awk -v min_len="$MIN_LENGTH" 'length($10) > min_len || $1 ~ /^@/' \
  | samtools view -bSq "$MIN_MAPQ" -@ "$THREADS" - \
  | samtools sort -@ "$THREADS" -o "$OUTPUT_DIR/winnowmap.sorted.bam" -
samtools index "$OUTPUT_DIR/winnowmap.sorted.bam"
echo "DONE: $OUTPUT_DIR/winnowmap.sorted.bam"
