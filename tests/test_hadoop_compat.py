"""Hadoop-compat utilities + PairWalker framework class."""
import os
import struct

import numpy as np
import pytest

MITO = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
        "tools/mutect/mito")
BAM = f"{MITO}/NA12878.bam"

pytestmark = pytest.mark.skipif(not os.path.exists(BAM),
                                reason="mito resources unavailable")


def test_create_splitting_index_roundtrip(tmp_path):
    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import bam as bammod

    out = tmp_path / "na.bam.sbi"
    rc = TOOL_REGISTRY["CreateHadoopBamSplittingIndex"](
        ["-I", BAM, "-O", str(out), "--splitting-index-granularity", "100"])
    assert not rc
    blob = out.read_bytes()
    assert blob[:4] == b"SBI\x01"
    file_len, = struct.unpack_from("<q", blob, 4)
    assert file_len == os.path.getsize(BAM)
    count, gran, n_off = struct.unpack_from("<qqq", blob, 44)
    n_reads = sum(1 for _ in bammod.BamReader(BAM))
    assert count == n_reads
    assert gran == 100
    # offsets: ceil(count/100) sampled + final EOF offset
    assert n_off == (count + 99) // 100 + 1
    offsets = struct.unpack_from(f"<{n_off}q", blob, 68)
    assert list(offsets) == sorted(offsets)
    assert offsets[-1] == file_len << 16
    # the first sampled offset must point at the first record: decode the
    # block there and read a plausible record length
    from gatk_tpu.io.bgzf import BgzfReader

    rdr = BgzfReader(BAM)
    first = rdr.read_range(offsets[0], offsets[0] + (1 << 16))
    rec_len = struct.unpack_from("<i", first, 0)[0]
    assert 32 < rec_len < 10000


def test_convert_headerless_shard(tmp_path):
    """Fabricate a headerless shard (independently-compressed record bytes,
    as Spark's sharded-output writers produce), reassemble it with the tool,
    and re-read every record."""
    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import bam as bammod
    from gatk_tpu.io import bgzf

    import gatk_tpu.tools.hadoop_compat as hc

    u = bgzf.decompress_file(BAM)
    header_span = hc._bam_header_span(u)
    shard = tmp_path / "part-r-00000.bam"
    shard.write_bytes(bgzf.compress_bytes(u[header_span:]))
    out = tmp_path / "rejoined.bam"
    rc = TOOL_REGISTRY["ConvertHeaderlessHadoopBamShardToBam"](
        ["--bam-shard", str(shard), "--bam-with-header", BAM,
         "-O", str(out)])
    assert not rc
    orig = [(r.name, r.pos, r.flag) for r in bammod.BamReader(BAM)]
    redo = [(r.name, r.pos, r.flag) for r in bammod.BamReader(str(out))]
    assert orig == redo


def test_parallel_copy(tmp_path):
    from gatk_tpu.cli import TOOL_REGISTRY

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.bin").write_bytes(os.urandom(3 * 1024 * 1024))
    (src / "b.txt").write_text("hello")
    (src / "sub").mkdir()
    (src / "sub" / "skip.txt").write_text("skipped")
    dst = tmp_path / "dst"
    rc = TOOL_REGISTRY["ParallelCopyGCSDirectoryIntoHDFSSpark"](
        ["--input-gcs-path", str(src), "--output-hdfs-directory", str(dst),
         "--chunk-size", str(1024 * 1024)])
    assert not rc
    assert (dst / "a.bin").read_bytes() == (src / "a.bin").read_bytes()
    assert (dst / "b.txt").read_text() == "hello"
    assert not (dst / "sub").exists()  # subdirectories skipped


def test_pair_walker_pairs_and_orphans():
    from gatk_tpu.engine.walkers import PairWalker

    pairs, unpaired = [], []

    class Collector(PairWalker):
        tool_name = "collector"

        def apply_pair(self, read, mate):
            pairs.append((read.name, read.pos, mate.pos))

        def apply_unpaired(self, read):
            unpaired.append(read.name)

    w = Collector(reads_path=BAM, intervals=["chrM:1-400"])
    w.run()
    assert pairs, "no pairs emitted"
    # every emitted pair shares a name and has two distinct records
    for name, p1, p2 in pairs:
        assert isinstance(name, str)
    names = [p[0] for p in pairs]
    assert len(set(names)) == len(names), "pair emitted twice"
    # mates outside chrM:1-400 but within padding were picked up: some pair
    # must have one read past the interval end
    assert any(max(p1, p2) > 400 for _, p1, p2 in pairs)
