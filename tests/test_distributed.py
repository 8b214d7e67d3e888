"""Multi-host helpers (single-process semantics + part-file merge)."""
import os


def test_host_read_range_partition():
    from yaha_tpu.parallel import distributed as dist
    n = 103
    pc = 4
    ranges = [dist.host_read_range(n, pi, pc) for pi in range(pc)]
    # Full cover, no overlap, host order.
    assert ranges[0][0] == 0
    assert ranges[-1][1] == n
    for (a, b), (c, d) in zip(ranges, ranges[1:]):
        assert b == c
        assert a <= b


def test_merge_part_files(tmp_path):
    from yaha_tpu.parallel import distributed as dist
    ofile = str(tmp_path / "out.sam")
    for pi in range(3):
        with open(dist.part_file_name(ofile, pi), "w") as f:
            f.write("part%d\n" % pi)
    dist.merge_part_files(ofile, 3, "@HD\n")
    with open(ofile) as f:
        assert f.read() == "@HD\npart0\npart1\npart2\n"
