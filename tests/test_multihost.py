"""Multi-process (jax.distributed) data-parallel calling tests.

The reference's cluster-vs-walker equivalence pattern
(HaplotypeCallerSparkIntegrationTest; GATKSparkTool.java:720-724) as a
2-process SPMD run: each process initializes jax.distributed against a local
coordinator, calls its contiguous target shard, writes a shard VCF, and
process 0 gathers. The gathered output must equal a 1-process run's output
byte-for-byte.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy integration tier (pytest.ini; testsettings.gradle:13-34)

MITO = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
        "tools/mutect/mito")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _hc_cmd(out, extra):
    return [
        sys.executable, "-m", "gatk_tpu", "HaplotypeCaller",
        "-I", f"{MITO}/NA12878.bam",
        "-R", f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta",
        "-L", "chrM:1-600",
        "-O", out,
        "--shard-size", "300",
        "--max-reads-per-alignment-start", "5",
        "--adaptive-pruning",
    ] + extra


def _run(cmd, env_extra=None):
    env = dict(os.environ)
    env["GATK_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.update(env_extra or {})
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _body(path):
    with open(path) as f:
        return [l for l in f if not l.startswith("#")]


def test_two_process_distributed_hc_matches_single(tmp_path):
    single = str(tmp_path / "single.vcf")
    p = _run(_hc_cmd(single, []))
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out

    dist = str(tmp_path / "dist.vcf")
    port = _free_port()
    procs = [
        _run(_hc_cmd(dist, [
            "--distributed-coordinator", f"127.0.0.1:{port}",
            "--distributed-num-processes", "2",
            "--distributed-process-id", str(pid),
        ]))
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    assert os.path.exists(dist)
    got = _body(dist)
    want = _body(single)
    assert got == want
    # the run actually called variants (not an empty-vs-empty pass)
    assert len(want) >= 3


def test_two_process_round_robin_matches_single(tmp_path):
    """Round-robin fine-shard assignment (--distributed-shard-mode round-robin,
    the SparkSharder-style load-balanced layout) + sorted gather must still be
    byte-equal to the 1-process run."""
    single = str(tmp_path / "single.vcf")
    p = _run(_hc_cmd(single, []))
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out

    dist = str(tmp_path / "rr.vcf")
    port = _free_port()
    procs = [
        _run(_hc_cmd(dist, [
            "--distributed-coordinator", f"127.0.0.1:{port}",
            "--distributed-num-processes", "2",
            "--distributed-process-id", str(pid),
            "--distributed-shard-mode", "round-robin",
        ]))
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
    assert _body(dist) == _body(single)


def test_two_process_private_dirs_collective_gather(tmp_path):
    """No-shared-filesystem gather: each process writes its shard VCF under its
    OWN private directory and the shard bytes travel over the jax.distributed
    collective fabric (gather_vcf_shards_collective); process 0's output must
    still be byte-equal to a 1-process run."""
    single = str(tmp_path / "single.vcf")
    p = _run(_hc_cmd(single, []))
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out

    port = _free_port()
    priv = [tmp_path / f"proc{pid}" for pid in range(2)]
    for d in priv:
        d.mkdir()
    outs_paths = [str(priv[pid] / "dist.vcf") for pid in range(2)]
    procs = [
        _run(_hc_cmd(outs_paths[pid], [
            "--distributed-coordinator", f"127.0.0.1:{port}",
            "--distributed-num-processes", "2",
            "--distributed-process-id", str(pid),
            "--distributed-gather", "collective",
        ]))
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
    # gathered result lands at process 0's output path only
    assert os.path.exists(outs_paths[0])
    assert _body(outs_paths[0]) == _body(single)
    # shard files were consumed; process 1 kept no output
    assert not os.path.exists(outs_paths[1])
