"""yaha_tpu — a TPU-native split-read DNA alignment engine.

A from-scratch reimplementation of the capabilities of yaha 0.1.83
(GregoryFaust/yaha): nib2 genome compression, k-mer indexing, and optimal
split-read query alignment with SAM/Blast8 output — redesigned for TPU
execution with JAX/XLA/Pallas for the compute path.

Layers:
  utils/     exact-parity primitives (RNG, 4-bit codec)
  io/        host I/O: nib2 codec, FASTA/FASTQ reader, index files, SAM writer
  index/     k-mer index construction
  core/      per-read alignment semantics (reference-exact oracle path)
  ops/       batched JAX/Pallas device kernels (banded SW, seed pipeline)
  parallel/  device-mesh sharding (data-parallel reads, sharded index)
"""

__version__ = "0.1.0"
