"""lastz_tpu — a TPU-native pairwise DNA local aligner.

A from-scratch re-design of the capabilities of LASTZ (Harris 2007;
reference implementation studied at /root/reference) for TPU hardware:
the seed-and-extend pipeline is expressed as staged array programs
(JAX/XLA) with Pallas kernels for the hot dynamic-programming loops,
while an exact host engine provides bit-identical golden-output parity
with the reference for every supported output format.

Layers (bottom to top; see SURVEY.md for the reference layer map):
  core/     encodings, score sets, spaced-seed patterns
  io/       sequence file readers (fasta/fastq/nib/2bit/hsx), actions
  index/    seed position index over the target (host + device builds)
  search/   seed-hit search, diagonal filtering, gap-free extension
  align/    segment tables, chaining, y-drop gapped extension, tweener
  ops/      Pallas TPU kernels (x-drop, y-drop wavefront DP, seed scan)
  parallel/ device-mesh sharding of the query stream and target index
  out/      output writers (lav/gfa/axt/maf/sam/cigar/general/...)
"""

__version__ = "0.1.0"
