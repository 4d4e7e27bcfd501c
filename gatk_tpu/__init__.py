"""gatk_tpu: a TPU-native variant-calling framework with GATK4's capabilities.

Built from scratch in JAX/XLA/Pallas. The compute path (PairHMM, Smith-Waterman,
genotyping math, activity profiles, BQSR histograms, CNV inference) runs on TPU as
batched array programs; host-side I/O (BAM/CRAM/FASTA/VCF) and the irregular
read-threading assembly run on CPU (numpy + C++), overlapped with device compute.

Reference behavior studied from GATK4 (/root/reference); see SURVEY.md. This is a
re-design, not a port: regions are batches of fixed-shape tensors, walkers are
host-side iterators feeding jitted stages, Spark/WDL scatter-gather becomes
jax.sharding data parallelism over interval shards.
"""

__version__ = "0.1.0"
