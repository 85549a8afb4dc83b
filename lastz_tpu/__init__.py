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


def _setup_jax_cache():
    """Persistent XLA compilation cache: every compile in this
    environment runs on the (weak) local host, so cache hits are
    worth minutes.  Applied at package import so all entry points
    (CLI, tests, benches, direct module use) share it."""
    import os
    import tempfile
    cache_dir = os.environ.get(
        "LASTZ_TPU_JAX_CACHE",
        os.path.join(tempfile.gettempdir(), "lastz_tpu_jax_cache"))
    if not cache_dir or cache_dir == "0":
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_setup_jax_cache()
