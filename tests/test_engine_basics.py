import numpy as np
import pytest

from gatk_tpu.engine import clipping, intervals
from gatk_tpu.io import sam
from gatk_tpu.io.reads import Read


def mk_read(pos, cigar, seq=None, quals=None, name="r1"):
    ops, lens = sam.cigar_from_string(cigar)
    n = sam.cigar_read_length(ops, lens)
    if seq is None:
        seq = np.frombuffer((b"ACGT" * (n // 4 + 1))[:n], dtype=np.uint8).copy()
    if quals is None:
        quals = np.full(n, 30, np.uint8)
    return Read(name, 0, 0, pos, 60, ops, lens, np.asarray(seq, np.uint8), np.asarray(quals, np.uint8))


class TestIntervals:
    def test_parse(self):
        iv = intervals.parse_interval("chr1:100-200")
        assert iv == intervals.Interval("chr1", 99, 200)
        iv = intervals.parse_interval("20:10,000,000-10,100,000")
        assert iv.start == 9999999 and iv.end == 10100000
        iv = intervals.parse_interval("chrM", {"chrM": 16569})
        assert iv.size == 16569

    def test_merge_and_split(self):
        ivs = [intervals.Interval("c", 0, 100), intervals.Interval("c", 50, 150),
               intervals.Interval("c", 200, 300)]
        merged = intervals.merge_overlapping(ivs)
        assert merged == [intervals.Interval("c", 0, 150), intervals.Interval("c", 200, 300)]
        parts = intervals.split_interval(intervals.Interval("c", 0, 250), 100)
        assert [p.size for p in parts] == [100, 100, 50]

    def test_shards(self):
        sh = intervals.Shard.make(intervals.Interval("c", 100, 200), 50, 220)
        assert sh.padded == intervals.Interval("c", 50, 220)


class TestClipping:
    def test_clip_left_simple(self):
        r = mk_read(100, "10M")
        c = clipping._clip_left(r, 3)
        assert c.pos == 103 and sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "7M"
        assert len(c.bases) == 7

    def test_clip_right_simple(self):
        r = mk_read(100, "10M")
        c = clipping._clip_right(r, 7)
        assert c.pos == 100 and sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "7M"

    def test_clip_through_insertion(self):
        r = mk_read(100, "4M2I4M")
        c = clipping._clip_left(r, 5)  # removes 4M and 1 of the I
        assert c.pos == 104
        assert sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "1I4M"

    def test_clip_through_deletion(self):
        r = mk_read(100, "4M2D4M")
        c = clipping._clip_left(r, 4)
        # the leading deletion is dropped and start moves past it
        assert c.pos == 106
        assert sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "4M"

    def test_hard_clip_to_interval(self):
        r = mk_read(100, "10M")
        c = clipping.hard_clip_to_interval(r, 103, 108)
        assert c.pos == 103 and c.end == 108
        assert len(c.bases) == 5

    def test_revert_soft_clips(self):
        r = mk_read(100, "3S5M2S")
        c = clipping.revert_soft_clipped_bases(r)
        assert c.pos == 97
        assert sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "10M"
        assert len(c.bases) == 10

    def test_hard_clip_soft_clips(self):
        r = mk_read(100, "3S5M2S")
        c = clipping.hard_clip_soft_clipped_bases(r)
        assert c.pos == 100
        assert sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "5M"
        assert len(c.bases) == 5

    def test_low_qual_ends(self):
        q = np.array([2, 2, 30, 30, 30, 30, 2], np.uint8)
        r = mk_read(100, "7M", quals=q)
        c = clipping.hard_clip_low_qual_ends(r, 9)
        assert c.pos == 102 and len(c.bases) == 4

    def test_unclipped_start_end(self):
        r = mk_read(100, "3S5M2S")
        assert r.unclipped_start() == 97
        assert r.unclipped_end() == 107
