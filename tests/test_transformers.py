"""Read transformer tests (engine/transformers.py vs transformers/*.java)."""
import numpy as np
import pytest

from gatk_tpu.engine import transformers as tr
from gatk_tpu.io.reads import Read
from gatk_tpu.io import sam as samio
from gatk_tpu.io.fasta import FastaReference
from gatk_tpu.utils.errors import UserError


def _read(bases=b"ACGT", pos=10, flag=0, quals=None, name="r1", mapq=60,
          cigar=None, mate_pos=-1, tlen=0):
    n = len(bases)
    ops, lens = cigar if cigar else (np.array([0], np.uint8), np.array([n], np.int32))
    return Read(name=name, flag=flag, ref_id=0, pos=pos, mapq=mapq,
                cigar_ops=ops, cigar_lens=lens,
                bases=np.frombuffer(bytes(bases), np.uint8).copy(),
                quals=(quals if quals is not None else np.full(n, 30, np.uint8)),
                mate_ref_id=0, mate_pos=mate_pos, tlen=tlen)


def test_iupac_to_n():
    r = tr.iupac_to_n(_read(b"ACRGTW"))
    assert bytes(r.bases) == b"ACNGTN"
    with pytest.raises(UserError):
        tr.iupac_to_n(_read(b"ACRT"), strict=True)
    # clean read untouched
    r2 = tr.iupac_to_n(_read(b"ACGTN"))
    assert bytes(r2.bases) == b"ACGTN"


def test_misencoded_and_strip_mate_and_mapq():
    r = _read(quals=np.full(4, 64, np.uint8))
    assert tr.misencoded_quals(r).quals.tolist() == [33, 33, 33, 33]
    with pytest.raises(UserError):
        tr.misencoded_quals(_read(quals=np.full(4, 20, np.uint8)))
    assert tr.strip_mate_number(_read(name="q/1")).name == "q"
    assert tr.strip_mate_number(_read(name="q2")).name == "q2"
    r = _read(mapq=255)
    assert tr.dragen_mapping_quality(r).mapq == 60
    assert tr.remap_mapping_quality(255, 42)(_read(mapq=255)).mapq == 42


def _ref(tmp_path, seq):
    p = tmp_path / "r.fa"
    p.write_text(">chr1\n" + seq + "\n")
    return FastaReference(str(p))


def test_palindrome_artifact_clip(tmp_path):
    # construct: reference whose bases upstream of the adaptor boundary are the
    # reverse complement of the read's soft-clipped start
    # layout (0-based): read aligned at pos=20 len 30 with 10S leading; mate
    # ends fragment at boundary; ref[boundary-n..boundary-1] revcomp == clip
    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    # read: first 10 bases soft-clipped artifact, rest matches ref at 20..40
    clip = "TTACGGATCC"
    body = seq[20:40]
    bases = (clip + body).encode()
    # upstream read (tlen>0): boundary = pos+1+|tlen| (1-based)
    tlen = 25
    boundary_1b = 20 + 1 + tlen  # 46
    n_compare = min(10 + 5, 30)  # 15
    ref_start_1b, ref_end_1b = boundary_1b - n_compare, boundary_1b - 1  # [31,45]
    # make ref revcomp-match the read tail-to-front at those positions
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    window = "".join(comp[c] for c in (clip + body)[:n_compare][::-1])
    seq2 = seq[: ref_start_1b - 1] + window + seq[ref_end_1b:]
    ref = _ref(tmp_path, seq2)
    r = _read(bases, pos=20, flag=0x1 | 0x2 | 0x20, mapq=60,
              cigar=(np.array([samio.OP_S, samio.OP_M], np.uint8),
                     np.array([10, 20], np.int32)),
              mate_pos=30, tlen=tlen)
    out = tr.palindrome_artifact_clip(ref, min_palindrome_size=5)(r)
    assert len(out.bases) == 20  # 10 artifact bases hard-clipped
    assert bytes(out.bases) == body.encode()
    # non-matching reference -> untouched
    ref2 = _ref(tmp_path, seq)
    r2 = _read(bases, pos=20, flag=0x1 | 0x2 | 0x20, mapq=60,
               cigar=(np.array([samio.OP_S, samio.OP_M], np.uint8),
                      np.array([10, 20], np.int32)),
               mate_pos=30, tlen=tlen)
    out2 = tr.palindrome_artifact_clip(ref2, min_palindrome_size=5)(r2)
    assert len(out2.bases) == 30


def test_compose_and_registry():
    f = tr.compose(tr.strip_mate_number, lambda r: tr.iupac_to_n(r))
    r = f(_read(b"ACRT", name="x/2"))
    assert r.name == "x" and bytes(r.bases) == b"ACNT"
    assert set(tr.TRANSFORMER_REGISTRY) >= {
        "IUPACReadTransformer", "MisencodedBaseQualityReadTransformer",
        "StripMateNumberTransformer", "MappingQualityReadTransformer",
        "DRAGENMappingQualityReadTransformer"}
    t = tr.TRANSFORMER_REGISTRY["IUPACReadTransformer"]()
    assert bytes(t(_read(b"ACRT")).bases) == b"ACNT"
