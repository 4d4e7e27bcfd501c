"""Multi-device sharding tests on the virtual 8-device CPU mesh (the reference's
Spark local-mode equivalence tests, SURVEY §4.4)."""
import numpy as np
import pytest

import __graft_entry__ as graft

pytestmark = pytest.mark.slow  # heavy integration tier (pytest.ini; testsettings.gradle:13-34)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = np.asarray(fn(*args))
    assert out.shape[0] == 1
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_sharded_matches_single_device():
    import jax

    from gatk_tpu.parallel import mesh as pmesh

    packed, rp, hmax = graft._example_batch(n_pairs=256)
    packed = pmesh.pad_pairs_to_devices(packed, packed["rbase"].shape[1], 8)
    interpret = jax.default_backend() == "cpu"
    mesh8 = pmesh.make_mesh(8)
    out8 = np.asarray(pmesh.pairhmm_sharded(mesh8, packed, rp, hmax, interpret=interpret))
    mesh1 = pmesh.make_mesh(1)
    out1 = np.asarray(pmesh.pairhmm_sharded(mesh1, packed, rp, hmax, interpret=interpret))
    np.testing.assert_allclose(out8, out1, atol=1e-6)


def test_split_interval_shards():
    from gatk_tpu.engine.intervals import Interval
    from gatk_tpu.parallel.scheduler import split_interval_shards

    targets = [Interval("chr1", 0, 1000), Interval("chr2", 500, 1500)]
    shards = split_interval_shards(targets, 4)
    assert len(shards) == 4
    # contiguous, non-overlapping, full coverage, never joined across targets
    flat = [iv for sh in shards for iv in sh]
    assert sum(iv.end - iv.start for iv in flat) == 2000
    per_contig = {}
    for iv in flat:
        per_contig.setdefault(iv.contig, []).append(iv)
    assert per_contig["chr1"][0].start == 0 and per_contig["chr1"][-1].end == 1000
    assert per_contig["chr2"][0].start == 500 and per_contig["chr2"][-1].end == 1500
    for ivs in per_contig.values():
        for a, b in zip(ivs, ivs[1:]):
            assert a.end == b.start


def test_sharded_calling_e2e_matches_single_device():
    """8-device-mesh full HaplotypeCaller run == single-device run on the real
    mito BAM (the HaplotypeCallerSparkIntegrationTest spark-vs-walker equivalence
    pattern, SURVEY §4.4)."""
    import jax

    from gatk_tpu.calling import hc_engine
    from gatk_tpu.engine.intervals import Interval
    from gatk_tpu.io import bam, fasta
    from gatk_tpu.parallel.scheduler import ShardedCaller

    M = "/root/reference/src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito"
    ref = fasta.FastaReference(f"{M}/Homo_sapiens_assembly38.mt_only.fasta")
    reads = list(bam.BamReader(f"{M}/NA12878.bam").query("chrM", 0, 700))
    args = hc_engine.HCArgs(adaptive_pruning=True, max_reads_per_alignment_start=4)
    engine = hc_engine.HaplotypeCallerEngine(ref, "NA12878", args)
    interval = Interval("chrM", 100, 350)

    from gatk_tpu.utils.javarandom import reset_random_generator

    devices = jax.local_devices()
    assert len(devices) >= 8, "conftest must provide the 8-device CPU mesh"
    multi = ShardedCaller(engine, devices)
    reset_random_generator()  # Utils.resetRandomGenerator: QD jitter determinism
    v_multi, _ = multi.call_interval(reads, interval)
    single = ShardedCaller(engine, devices[:1])
    reset_random_generator()
    v_single, _ = single.call_interval(reads, interval)

    assert [str(v) for v in v_multi] == [str(v) for v in v_single]
    called = {v.pos for v in v_multi}  # 0-based; VCF positions are pos+1
    assert {151, 262, 309} <= called, called


def test_shard_retry_fault_injection(monkeypatch):
    """A shard that fails transiently is retried with fresh reads and the
    gathered output is unaffected (elastic recovery, SURVEY §5)."""
    from gatk_tpu.calling import hc_engine
    from gatk_tpu.engine.intervals import Interval
    from gatk_tpu.io import bam, fasta
    from gatk_tpu.parallel.scheduler import ShardedCaller
    from gatk_tpu.utils.javarandom import reset_random_generator

    M = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
         "tools/mutect/mito")
    ref = fasta.FastaReference(f"{M}/Homo_sapiens_assembly38.mt_only.fasta")
    rd = bam.BamReader(f"{M}/NA12878.bam")
    args = hc_engine.HCArgs(adaptive_pruning=True, max_reads_per_alignment_start=4)
    engine = hc_engine.HaplotypeCallerEngine(ref, "NA12878", args)
    caller = ShardedCaller(engine)
    targets = [Interval("chrM", 100, 250), Interval("chrM", 250, 350)]
    pulls = []

    def source(iv):
        pulls.append(iv.start)
        return list(rd.query("chrM", max(0, iv.start - 300), iv.end + 300))

    reset_random_generator()
    clean = caller.call_targets(source, targets)

    # second shard fails twice, then succeeds on the third attempt
    monkeypatch.setenv("GATK_TPU_FAULT_INJECT", "chrM:250:2")
    pulls.clear()
    reset_random_generator()
    retried = caller.call_targets(source, targets)
    assert pulls.count(250) == 3  # reads re-pulled per attempt
    assert [str(v) for v in retried] == [str(v) for v in clean]

    # a permanently failing shard surfaces the error after max attempts
    monkeypatch.setenv("GATK_TPU_FAULT_INJECT", "chrM:250:99")
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="injected fault"):
        caller.call_targets(source, targets)
