"""Multi-host runtime: jax.distributed init + per-host read sharding.

The reference is strictly single-host (SURVEY.md section 5, "distributed
communication backend: none").  The TPU framework scales across hosts of a
pod slice with the standard JAX multi-controller model:

  * every host calls `initialize()` (jax.distributed) and builds the same
    global (data x model) mesh over all chips;
  * the query file is range-sharded per host (`host_read_range`) so each
    host's input pipeline feeds only its own chips — the multi-host analog
    of the reference's flockfile work stealing (Query.c:34-38);
  * per-host SAM fragments are written to per-host part files and
    concatenated in host order, preserving the contiguous-per-query
    ordering guarantee without any cross-host serialization.

Run statistics (reads aligned, cells computed) merge with psum over the
global mesh; everything else is embarrassingly data-parallel across hosts.
"""
from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bring-up (no-op for single-process runs)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_read_range(n_reads: int, process_index: int | None = None,
                    process_count: int | None = None) -> tuple[int, int]:
    """[lo, hi) slice of the query file owned by this host."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (n_reads + pc - 1) // pc
    lo = min(pi * per, n_reads)
    return lo, min(lo + per, n_reads)


def part_file_name(ofile_name: str, process_index: int | None = None) -> str:
    pi = jax.process_index() if process_index is None else process_index
    return "%s.part%05d" % (ofile_name, pi)


def merge_part_files(ofile_name: str, process_count: int,
                     header: str) -> None:
    """Host-0 concatenation of per-host SAM parts in host order."""
    with open(ofile_name, "w") as out:
        out.write(header)
        for pi in range(process_count):
            with open(part_file_name(ofile_name, pi)) as f:
                out.write(f.read())
