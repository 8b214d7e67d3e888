#!/bin/bash
# 3 Gbp headline validation: nib2 + default L15 index byte-identity vs the
# reference binary, with wall times (BASELINE.md scale table).
# Usage: tools/hgscale_validate.sh [workdir]
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
D=${1:-/tmp/hgscale}
REF=/root/yaha_ref_build/bin/yaha
REF83=/root/yaha_ref_build2/bin/yaha83
mkdir -p $D
cd $D

if [ ! -f big.fasta ]; then
  echo "=== generating 3 Gbp genome ==="
  time python3 $REPO/tools/make_big_genome.py big.fasta --gbp 3.0
fi

echo "=== reference compress ==="
cp big.fasta ref_big.fasta
time $REF83 -g ref_big.fasta -c 2>/dev/null || true
echo "=== our compress ==="
time PYTHONPATH=$REPO python3 -m yaha_tpu.cli -g big.fasta -c
cmp ref_big.nib2 big.nib2 && echo "NIB2_IDENTICAL"

echo "=== reference index build (L15 default) ==="
time $REF -g ref_big.nib2 2>/dev/null
echo "=== our index build (native threaded) ==="
time PYTHONPATH=$REPO python3 -m yaha_tpu.cli -g big.nib2
cmp ref_big.X15_01_65525S big.X15_01_65525S && echo "INDEX_IDENTICAL"
ls -la $D/*.X15*
