#!/bin/bash
# Generate golden outputs from the reference yaha binaries.
# Requires the reference built at /root/yaha_ref_build/bin/yaha (user mode)
# and /root/yaha_ref_build2/bin/yaha83 (non-user mode, exposes -c/-u).
# Goldens are committed so tests run without the reference binary.
set -e
cd "$(dirname "$0")/.."
DATA=tests/data
GOLD=tests/golden
YAHA=/root/yaha_ref_build/bin/yaha
YAHA83=/root/yaha_ref_build2/bin/yaha83
mkdir -p $GOLD

# Work in a scratch dir so generated .nib2/.X files land outside the repo data dir.
# Fixed scratch path: it appears verbatim in SAM @PG lines, so it must be
# deterministic for byte-parity tests (tests recreate the index at this path).
SCRATCH=/tmp/yahagold
rm -rf $SCRATCH && mkdir -p $SCRATCH
cp $DATA/testgen.fasta $SCRATCH/
G=$SCRATCH/testgen.fasta

# --- codec goldens (round trip) ---
$YAHA83 -g $G -c 2>/dev/null
cp $SCRATCH/testgen.nib2 $GOLD/testgen.nib2
# NOTE: reference aborts in exit-time cleanup (free of argv-owned gfileName,
# Main.c:579-582 + AlignArgs.c:95) AFTER writing the output; tolerate it.
$YAHA83 -g $SCRATCH/testgen.nib2 -u 2>/dev/null || true
cp $SCRATCH/testgen.fasta $GOLD/testgen.uncompressed.fasta

# --- index goldens ---
# NOTE: default wordLen 15 gives a 4^15 SO array (4.3GB index file) regardless
# of genome size (Index.c:84-86), so committed goldens use smaller -L; the code
# path is identical.
# L11 (the standard test index)
$YAHA -g $SCRATCH/testgen.nib2 -L 11 2>/dev/null
cp $SCRATCH/testgen.X11_01_65525S $GOLD/
# L9 (small, byte-parity friendly)
$YAHA -g $SCRATCH/testgen.nib2 -L 9 2>/dev/null
cp $SCRATCH/testgen.X09_01_65525S $GOLD/
# L10 S3 (skipDist > 1)
$YAHA -g $SCRATCH/testgen.nib2 -L 10 -S 3 2>/dev/null
cp $SCRATCH/testgen.X10_03_65525S $GOLD/
# L11 with low maxHits to exercise random index down-sampling
$YAHA -g $SCRATCH/testgen.nib2 -L 11 -H 20 2>/dev/null
cp $SCRATCH/testgen.X11_01_00020S $GOLD/

IDX=testgen.X11_01_65525S

# --- SAM goldens ---
# Run from inside the scratch dir with canonical relative paths so the @PG
# CL line (which embeds -q/-x/-o paths verbatim) is reproducible by parity
# tests running in their own scratch dir.
cp $DATA/reads*.fast[aq] $SCRATCH/
REPO=$PWD
cd $SCRATCH
run() {  # run <outfile> <readfile> <extra args...>
  local out=$1; shift
  local reads=$1; shift
  $YAHA -x $IDX -q $reads "$@" $out 2>/dev/null
  cp $out $REPO/$GOLD/$out
}

run A_default.sam  readsA_100bp.fasta  -osh
run A_soft.sam     readsA_100bp.fasta  -oss
run A_fbs.sam      readsA_100bp.fasta  -FBS Y -osh
run A_all.sam      readsA_100bp.fasta  -OQC N -osh
run A_edit.sam     readsA_100bp.fasta  -AGS N -osh
run A_blast8.out   readsA_100bp.fasta  -o8
run B_default.sam  readsB_500bp.fasta  -osh
run B_fbs.sam      readsB_500bp.fasta  -FBS Y -osh
run C_default.sam  readsC_1kb.fasta    -osh
run C_params.sam   readsC_1kb.fasta    -BW 3 -G 20 -M 15 -X 15 -osh
run D_default.sam  readsD_sv.fasta     -osh
run D_fbs.sam      readsD_sv.fasta     -FBS Y -osh
run D_all.sam      readsD_sv.fasta     -OQC N -osh
run E_fastq.sam    readsE_150bp.fastq  -osh
run F_edge.sam     readsF_edge.fasta   -osh

# low maxHits index run (sampled index + query maxHits interplay)
$YAHA -x testgen.X11_01_00020S -q readsA_100bp.fasta -H 20 -osh A_h20.sam 2>/dev/null
cp A_h20.sam $REPO/$GOLD/A_h20.sam
cd $REPO

for f in $GOLD/testgen.X*S; do gzip -f "$f"; done
rm -rf $SCRATCH
echo "goldens written to $GOLD"
ls -la $GOLD
