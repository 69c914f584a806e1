#!/usr/bin/env bash
# Call whole-genome CNV segments from a long-read BAM with CNVkit,
# producing the .cns file that seeds coral_tpu (seed/reconstruct modes).
#
# Usage: call_cnvs.sh BAM REFERENCE_CNN OUTPUT_DIR
set -euo pipefail

BAM=${1:?usage: call_cnvs.sh BAM REFERENCE_CNN OUTPUT_DIR}
REFERENCE_CNN=${2:?missing reference .cnn}
OUTPUT_DIR=${3:?missing output dir}

mkdir -p "$OUTPUT_DIR"
cnvkit.py batch "$BAM" \
    --seq-method wgs \
    --drop-low-coverage \
    --reference "$REFERENCE_CNN" \
    --scatter --diagram \
    -d "$OUTPUT_DIR"
