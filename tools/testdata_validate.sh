#!/bin/bash
# VERDICT item: run the reference's bundled hg18 read sets (realistic
# wgsim length/error mixes) through both aligners against the 3 Gbp
# synthetic genome, recording record parity + reads/s; then simulate
# SV events (the bundled SV read FASTAs are stripped from the mirror)
# and measure breakpoint recall for both aligners with bedpe_eval.
#
# Requires tools/hgscale_validate.sh artifacts in $D.
# Usage: tools/testdata_validate.sh [workdir]
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
D=${1:-/tmp/hgscale}
REF=/root/yaha_ref_build/bin/yaha
TD=/root/reference/testdata
IDX=big.X15_01_65525S
cd $D

echo "=== hg18 read-set parity (both aligners vs 3 Gbp genome) ==="
for gz in $TD/hg18L*.fasta.gz; do
  name=$(basename $gz .fasta.gz)
  zcat $gz > reads.fasta
  n=$(grep -c '^>' reads.fasta)
  s=$(date +%s.%N)
  $REF -x $IDX -q reads.fasta -osh ref.sam 2>/dev/null
  e=$(date +%s.%N)
  rt=$(python3 -c "print('%.2f' % ($e - $s))")
  s=$(date +%s.%N)
  PYTHONPATH=$REPO python3 -m yaha_tpu.cli -x $IDX -q reads.fasta \
      --engine native -osh my.sam 2>/dev/null
  e=$(date +%s.%N)
  mt=$(python3 -c "print('%.2f' % ($e - $s))")
  par=$(python3 - <<EOF
ref = sorted(l for l in open("ref.sam","rb").read().splitlines() if not l.startswith(b"@PG"))
my = sorted(l for l in open("my.sam","rb").read().splitlines() if not l.startswith(b"@PG"))
print("IDENTICAL" if ref == my else "DIFF")
EOF
)
  echo "$name reads=$n ref=${rt}s ours=${mt}s parity=$par"
done

echo "=== SV breakpoint recall (simulated vs 3 Gbp genome) ==="
PYTHONPATH=$REPO python3 $REPO/tools/make_sv_testdata.py big.nib2 svsim \
    --events 200
$REF -x $IDX -q svsim.fasta -osh ref_sv.sam 2>/dev/null
PYTHONPATH=$REPO python3 -m yaha_tpu.cli -x $IDX -q svsim.fasta \
    --engine native -osh my_sv.sam 2>/dev/null
par=$(python3 - <<EOF
ref = sorted(l for l in open("ref_sv.sam","rb").read().splitlines() if not l.startswith(b"@PG"))
my = sorted(l for l in open("my_sv.sam","rb").read().splitlines() if not l.startswith(b"@PG"))
print("IDENTICAL" if ref == my else "DIFF")
EOF
)
echo "SV SAM parity: $par"
echo -n "reference "; python3 $REPO/tools/bedpe_eval.py ref_sv.sam svsim.sim.bedpe 50
echo -n "yaha_tpu  "; python3 $REPO/tools/bedpe_eval.py my_sv.sam svsim.sim.bedpe 50
