"""svtrek_tpu — a TPU-native structural-variant audit + discovery engine.

A from-scratch framework with the capabilities of the reference SVTrek
(single-binary C tool; see SURVEY.md): `audt` mode refines imprecise SV
breakpoints in a VCF against long-read BAM evidence; `disc` mode discovers
SVs from pangenome graph alignments (GFA+GAF+FASTQ).

Architecture (TPU-first, not a port):
- io/       host-side parsers & writers (BGZF/BAM/BAI/VCF/GFA/GAF/FASTQ)
- oracle/   exact scalar semantics (executable spec for parity testing)
- ops/      batched JAX/XLA/Pallas kernels (CIGAR walk, consensus, POA)
- pipeline/ host→device batching drivers for both modes
- parallel/ jax.sharding mesh + multi-chip step
- native/   C fast paths (BGZF/BAM region fetch) via ctypes
"""
import jax

# Consensus totals are 64-bit (the reference accumulates into uint64,
# refinement.c:59); enable x64 before any kernel is traced.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
