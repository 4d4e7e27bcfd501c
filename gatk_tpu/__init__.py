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

import os as _os


def _apply_platform_override():
    """GATK_TPU_PLATFORM=cpu forces the CPU backend even where the environment
    pre-imports jax with a TPU plugin (the axon harness's sitecustomize ignores
    launch-time JAX_PLATFORMS; jax.config still wins before backend init).
    Used by multi-process CPU tests and CLI subprocesses."""
    plat = _os.environ.get("GATK_TPU_PLATFORM")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:  # pragma: no cover
            pass


_apply_platform_override()


def _enable_compilation_cache():
    """Persist XLA compiles across processes (~tens of seconds each through the
    remote-compile path; the whole HaplotypeCaller shape ladder is reused run to
    run). Set GATK_TPU_NO_CACHE=1 to disable."""
    if _os.environ.get("GATK_TPU_NO_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
            _os.path.expanduser("~"), ".cache", "gatk_tpu", "xla_cache"
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
