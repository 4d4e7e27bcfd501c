"""Multi-process (multi-host) data-parallel calling via jax.distributed.

TPU-native replacement for the reference's cluster runtime
(engine/spark/GATKSparkTool.java:76,535,720-724 builds a JavaSparkContext and
distributes reads as RDDs; engine/spark/SparkSharder.java:39-56 shards
coordinate-sorted data by interval). Here distribution is the WDL
scatter-gather collapsed into one SPMD program launch:

  * every process calls `initialize()` (jax.distributed.initialize) and gets
    the same global device mesh;
  * the target intervals are split into `num_processes` contiguous bp-balanced
    shards (split_interval_shards — SplitIntervals.java:77 semantics), and each
    process calls ONLY its own shard with its LOCAL devices (no cross-host
    traffic during calling: interval padding is the halo exchange, SURVEY §5.7);
  * each process writes `<out>.shard-<pid>.vcf`; a barrier, then process 0
    concatenates the shards in shard order (contiguous interval ranges keep the
    result coordinate-sorted) — the GatherVcfsCloud pattern
    (tools/GatherVcfsCloud.java).

Determinism: the shard plan depends only on (targets, num_processes), and each
region's results depend only on its padded-interval reads, so N-process output
== 1-process output byte-for-byte (proved by tests/test_multihost.py).
"""
from __future__ import annotations

import os

import jax

from .scheduler import split_interval_shards


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_ids=None):
    """jax.distributed.initialize wrapper. On CPU backends (tests / multi-host
    CPU scale-out) pass local_device_ids to slice the forced host platform
    device count per process."""
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def barrier(name: str = "gatk_tpu"):
    """Global cross-process barrier (all hosts reach this point)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def shard_targets(targets, num_processes: int | None = None,
                  process_id: int | None = None, mode: str = "contiguous"):
    """This process's bp-balanced target shard.

    When the target list is already fine-grained (>= num_processes targets,
    e.g. via --shard-size), WHOLE targets are assigned so every process plans
    regions over exactly the same interval boundaries a 1-process run would
    (exact output equality): `contiguous` runs (the GatherVcfsCloud-friendly
    layout) or `round-robin` interleaving (SparkSharder-style fine-grained
    load balancing — work hotspots spread across processes). Otherwise targets
    are bp-split (split_interval_shards)."""
    n = jax.process_count() if num_processes is None else num_processes
    pid = jax.process_index() if process_id is None else process_id
    targets = list(targets)
    if mode == "round-robin" and len(targets) >= n:
        return targets[pid::n]
    if len(targets) >= n:
        total = sum(t.end - t.start for t in targets)
        shards, cur, acc = [], [], 0
        remaining = total
        for i, t in enumerate(targets):
            cur.append(t)
            acc += t.end - t.start
            remaining -= t.end - t.start
            slots_left = n - len(shards)
            # close the shard once it reaches its fair share, keeping at least
            # one target per remaining slot
            if len(shards) < n - 1 and acc * slots_left >= remaining + acc and \
                    len(targets) - i - 1 >= slots_left - 1:
                shards.append(cur)
                cur, acc = [], 0
        shards.append(cur)
        while len(shards) < n:
            shards.append([])
        return shards[pid]
    shards = split_interval_shards(targets, n)
    return shards[pid] if pid < len(shards) else []


def shard_vcf_path(output: str, process_id: int) -> str:
    return f"{output}.shard-{process_id:05d}"


def gather_vcf_shards(output: str, num_processes: int, keep_shards: bool = False,
                      sort: bool = False):
    """Concatenate per-process shard VCFs (in shard order) into `output`.
    With contiguous sharding concatenation preserves coordinate order; pass
    sort=True for round-robin sharding (records re-sorted by the header's
    contig order + position before writing — the GatherVcfsCloud merge)."""
    header_lines = []
    records = []
    with open(output, "w") as out:
        wrote_header = False
        for pid in range(num_processes):
            path = shard_vcf_path(output, pid)
            if not os.path.exists(path):
                continue
            with open(path) as f:
                for line in f:
                    if line.startswith("#"):
                        if not wrote_header:
                            out.write(line)
                            header_lines.append(line)
                        continue
                    if sort:
                        records.append(line)
                    else:
                        out.write(line)
            wrote_header = True
            if not keep_shards:
                os.remove(path)
        if sort:
            contig_order = {}
            for h in header_lines:
                if h.startswith("##contig=<ID="):
                    name = h.split("ID=")[1].split(",")[0].split(">")[0]
                    contig_order[name] = len(contig_order)
            records.sort(key=lambda l: (
                contig_order.get(l.split("\t", 1)[0], 1 << 30),
                int(l.split("\t", 2)[1])))
            out.writelines(records)


def gather_vcf_shards_collective(output: str, shard_path: str, sort: bool = False,
                                 keep_shards: bool = False):
    """Shared-filesystem-free gather: every process contributes its local
    shard VCF's bytes via multihost_utils.process_allgather (padded uint8
    arrays — the transfer rides the jax.distributed collective fabric, not a
    common mount), and process 0 writes the merged output locally.

    Topology contract: every process calls this exactly once after finishing
    its shard (it is itself a barrier); shard files may live in per-process
    private directories. Suitable for per-shard outputs up to the coordinator
    hosts' memory; for terabyte-scale cohort VCFs use the file-based
    gather_vcf_shards on a shared mount instead."""
    import numpy as np
    from jax.experimental import multihost_utils

    data = b""
    if shard_path and os.path.exists(shard_path):
        with open(shard_path, "rb") as fh:
            data = fh.read()
    lens = multihost_utils.process_allgather(np.array([len(data)], np.int32))
    max_len = int(np.asarray(lens).max())
    buf = np.zeros(max(1, max_len), np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    if not keep_shards and shard_path and os.path.exists(shard_path):
        os.remove(shard_path)
    if jax.process_index() != 0:
        return
    texts = []
    flat_lens = np.asarray(lens).reshape(-1)
    for pid in range(jax.process_count()):
        n = int(flat_lens[pid])
        if n:
            texts.append(gathered[pid, :n].tobytes().decode())
    header_lines = []
    records = []
    with open(output, "w") as out:
        wrote_header = False
        for text in texts:
            for line in text.splitlines(keepends=True):
                if line.startswith("#"):
                    if not wrote_header:
                        out.write(line)
                        header_lines.append(line)
                    continue
                if sort:
                    records.append(line)
                else:
                    out.write(line)
            wrote_header = True
        if sort:
            contig_order = {}
            for h in header_lines:
                if h.startswith("##contig=<ID="):
                    name = h.split("ID=")[1].split(",")[0].split(">")[0]
                    contig_order[name] = len(contig_order)
            records.sort(key=lambda l: (
                contig_order.get(l.split("\t", 1)[0], 1 << 30),
                int(l.split("\t", 2)[1])))
            out.writelines(records)
