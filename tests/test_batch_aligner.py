"""Batched (phased-DP) aligner end-to-end parity vs reference goldens."""
import gzip
import os

import numpy as np
import pytest

from conftest import DATA, GOLD


@pytest.fixture(scope="module")
def env(genome, test_index):
    return genome, test_index


@pytest.mark.parametrize("reads,gold,extra", [
    ("readsA_100bp.fasta", "A_default.sam", {}),
    ("readsD_sv.fasta", "D_default.sam", {}),
    ("readsB_500bp.fasta", "B_fbs.sam", {"fbs": True}),
    ("readsD_sv.fasta", "D_all.sam", {"oqc": False}),
])
def test_batch_aligner_parity(env, reads, gold, extra):
    from yaha_tpu.config import AlignmentArgs
    from yaha_tpu.io import fasta, sam
    from yaha_tpu.models.aligner import BatchAligner

    genome, index = env
    aa = AlignmentArgs()
    aa.qfile_name = reads
    aa.xfile_name = "testgen.X11_01_65525S"
    aa.ofile_name = gold
    for k, v in extra.items():
        setattr(aa, k, v)
    aa.post_process(True)
    aa.word_len = index.word_len
    with open(os.path.join(DATA, reads), "rb") as f:
        qdata = f.read()
    aa.fastq = qdata[:1] == b"@"
    recs = list(fasta.read_queries(qdata, aa))
    aligner = BatchAligner(aa, genome, index, backend="numpy")
    outs = aligner.align_batch(recs)
    mine = sam.file_header(aa, genome) + "".join(outs)
    with open(os.path.join(GOLD, gold)) as f:
        gold_text = f.read()
    assert mine == gold_text
