"""float32 threshold semantics (-P/-PRL/-PSS).

The reference stores minIdentity/FBS_PSLength/FBS_PSScore as C `float`
(Math.h:292,314-315); comparisons promote the float32-rounded value, so
exact-boundary identity ratios flip accept/reject (fuzz seed 10226:
identity 660/1100 == 0.6 must REJECT under -P 0.60 because
float32(0.60) > 0.6).
"""
import subprocess
import sys
import os

import numpy as np

from yaha_tpu.config import AlignmentArgs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_are_float32_rounded():
    aa = AlignmentArgs()
    assert aa.min_identity == float(np.float32(0.9))
    assert aa.fbs_ps_length == float(np.float32(0.9))
    assert aa.fbs_ps_score == float(np.float32(0.9))


def test_parse_rounds_through_float32():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    code = (
        "import sys; sys.argv=['yaha']\n"
        "from yaha_tpu import cli\n"
        "print(repr(cli._parse_float('0.60', '-P')))\n")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True)
    assert out.stdout.strip() == repr(float(np.float32(0.60)))
    # The rounded threshold sits ABOVE the exact ratio 3/5, so an
    # identity of exactly 660/1100 rejects (ratio < threshold).
    assert 660 / 1100 < float(np.float32(0.60))
