#!/usr/bin/env bash
# Fetch the UCSC refGene annotation table(s) used by `plot` mode's gene
# track.  Neither this repo nor the reference ships these files (UCSC
# licensing); the plot degrades to an empty gene track without them.
#
# Usage: scripts/fetch_refgene.sh [hg38|hg19|mm10 ...] [-o OUTDIR]
# Writes refGene_<build>.txt into OUTDIR (default: current directory —
# plot mode searches the working directory at call time).
set -euo pipefail

outdir="."
builds=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    -o) outdir="$2"; shift 2 ;;
    *) builds+=("$1"); shift ;;
  esac
done
[[ ${#builds[@]} -gt 0 ]] || builds=(hg38)

mkdir -p "$outdir"
for build in "${builds[@]}"; do
  url="https://hgdownload.soe.ucsc.edu/goldenPath/${build}/database/refGene.txt.gz"
  out="$outdir/refGene_${build}.txt"
  echo "fetching $url -> $out"
  curl -fsSL "$url" | gunzip -c > "$out"
  echo "  $(wc -l < "$out") transcript rows"
done
