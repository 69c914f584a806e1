#!/usr/bin/env bash
# Trim (Trimmomatic), align (bwa mem), sort, and deduplicate (Picard)
# paired-end Illumina reads; emits alignment/insert-size metrics.
#
# Usage: align_illumina_reads.sh R1 R2 ID GENOME_FA ADAPTERS_FA OUTPUT_DIR THREADS
# Requires: trimmomatic, bwa, samtools, picard on PATH (or set PICARD/TRIMMOMATIC).
set -euo pipefail

R1=${1:?usage: align_illumina_reads.sh R1 R2 ID GENOME_FA ADAPTERS_FA OUTPUT_DIR THREADS}
R2=${2:?}
ID=${3:?}
GENOME_REF=${4:?}
ADAPTERS=${5:?}
OUTPUT_DIR=${6:?}
THREADS=${7:-8}

PICARD=${PICARD:-picard}
TRIMMOMATIC=${TRIMMOMATIC:-trimmomatic}

mkdir -p "$OUTPUT_DIR"/trimmomatic/{paired,unpaired}
R1P=$OUTPUT_DIR/trimmomatic/paired/${ID}_R1.trim.fastq.gz
R2P=$OUTPUT_DIR/trimmomatic/paired/${ID}_R2.trim.fastq.gz
R1U=$OUTPUT_DIR/trimmomatic/unpaired/${ID}_R1.unpaired.trim.fastq.gz
R2U=$OUTPUT_DIR/trimmomatic/unpaired/${ID}_R2.unpaired.trim.fastq.gz
SORTBAM=$OUTPUT_DIR/${ID}.sort.bam
RMDUP_BAM=$OUTPUT_DIR/${ID}.sort.rmdup.bam

echo "Trimming reads..."
$TRIMMOMATIC PE "$R1" "$R2" "$R1P" "$R1U" "$R2P" "$R2U" \
    LEADING:3 TRAILING:3 SLIDINGWINDOW:4:15 MINLEN:20 \
    "ILLUMINACLIP:$ADAPTERS:2:30:10" -threads "$THREADS"

echo "Aligning reads..."
bwa mem -t "$THREADS" \
    -R "@RG\tID:${ID}\tLB:${ID}\tPL:ILLUMINA\tSM:${ID}" \
    "$GENOME_REF" "$R1P" "$R2P" \
  | samtools view -Sb - \
  | samtools sort -@ "$THREADS" -o "$SORTBAM" -

echo "Marking and removing duplicates..."
$PICARD MarkDuplicates INPUT="$SORTBAM" OUTPUT="$RMDUP_BAM" \
    METRICS_FILE="$OUTPUT_DIR/${ID}.markduplicates_metrics.txt" \
    VALIDATION_STRINGENCY=LENIENT ASSUME_SORTED=true REMOVE_DUPLICATES=true
samtools index "$RMDUP_BAM"

echo "Collecting metrics..."
$PICARD CollectAlignmentSummaryMetrics R="$GENOME_REF" I="$RMDUP_BAM" \
    O="$OUTPUT_DIR/${ID}.alignment_metrics.txt"
$PICARD CollectInsertSizeMetrics I="$RMDUP_BAM" \
    O="$OUTPUT_DIR/${ID}.insert_metrics.txt" \
    H="$OUTPUT_DIR/${ID}.insert_size_histogram.pdf"
echo "DONE: $RMDUP_BAM"
