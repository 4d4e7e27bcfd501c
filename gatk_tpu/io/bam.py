"""BAM reader/writer (htsjdk BAMFileReader / ReadsPathDataSource equivalent).

Reference behavior: engine/ReadsPathDataSource.java (multi-file merge, interval
queries); format per the SAM/BAM spec. Pure python+numpy for now; a C++ BGZF+record
scanner (native/) is the planned fast path for multi-GB inputs.
"""
from __future__ import annotations

import struct

import numpy as np

from . import bgzf, sam
from .reads import Read, encode_tags, parse_tags


class BamReader:
    def __init__(self, path: str):
        self.path = path
        data = bgzf.decompress_file(path)
        if data[:4] != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        (l_text,) = struct.unpack_from("<i", data, 4)
        off = 8
        text = data[off : off + l_text].split(b"\x00", 1)[0].decode()
        off += l_text
        (n_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        names, lengths = [], []
        for _ in range(n_ref):
            (l_name,) = struct.unpack_from("<i", data, off)
            off += 4
            names.append(data[off : off + l_name - 1].decode())
            off += l_name
            (l_ref,) = struct.unpack_from("<i", data, off)
            off += 4
            lengths.append(l_ref)
        self.header = sam.SamHeader.parse(text, names, lengths)
        if not self.header.sequences:
            self.header.sequences = [
                sam.SequenceRecord(n, l, i) for i, (n, l) in enumerate(zip(names, lengths))
            ]
            self.header._name_to_index = {s.name: s.index for s in self.header.sequences}
        self._data = data
        self._records_start = off

    def __iter__(self):
        data = self._data
        off = self._records_start
        n = len(data)
        unpack_core = struct.Struct("<iiIHHiiii").unpack_from
        while off < n:
            (block_size,) = struct.unpack_from("<i", data, off)
            rec_end = off + 4 + block_size
            (ref_id, pos, l_rn_mapq_bin, n_cigar, flag, l_seq,
             next_ref, next_pos, tlen) = unpack_core(data, off + 4)
            l_read_name = l_rn_mapq_bin & 0xFF
            mapq = (l_rn_mapq_bin >> 8) & 0xFF
            p = off + 4 + 32
            name = data[p : p + l_read_name - 1].decode()
            p += l_read_name
            cigar_raw = np.frombuffer(data, dtype="<u4", count=n_cigar, offset=p)
            p += 4 * n_cigar
            n_seq_bytes = (l_seq + 1) // 2
            seq4 = np.frombuffer(data, dtype=np.uint8, count=n_seq_bytes, offset=p)
            p += n_seq_bytes
            quals = np.frombuffer(data, dtype=np.uint8, count=l_seq, offset=p).copy()
            p += l_seq
            tags = parse_tags(data[p:rec_end])
            # unpack 4-bit bases -> ASCII
            hi = seq4 >> 4
            lo = seq4 & 0xF
            codes = np.empty(n_seq_bytes * 2, np.uint8)
            codes[0::2] = hi
            codes[1::2] = lo
            bases = sam._NT16_TO_CHAR[codes[:l_seq]]
            yield Read(
                name=name, flag=flag, ref_id=ref_id, pos=pos, mapq=mapq,
                cigar_ops=(cigar_raw & 0xF).astype(np.uint8),
                cigar_lens=(cigar_raw >> 4).astype(np.int32),
                bases=bases, quals=quals, mate_ref_id=next_ref, mate_pos=next_pos,
                tlen=tlen, tags=tags,
            )
            off = rec_end

    def query(self, contig: str | None = None, start: int = 0, end: int | None = None):
        """Reads overlapping [start, end) on contig (0-based); whole file if no contig.

        Unmapped-with-mapped-mate reads placed in the interval are included (they
        carry a position); fully unmapped reads only appear in whole-file iteration.
        """
        if contig is None:
            yield from iter(self)
            return
        rid = self.header.sequence_index(contig)
        if end is None:
            end = self.header.sequences[rid].length
        for r in self:
            if r.ref_id != rid:
                continue
            if r.pos < end and (r.is_unmapped or r.end > start):
                yield r


class BamWriter:
    def __init__(self, path: str, header: sam.SamHeader):
        self.path = path
        self.header = header
        self._chunks = []
        text = header.text
        if not text:
            text = "".join(
                f"@SQ\tSN:{s.name}\tLN:{s.length}\n" for s in header.sequences
            ) + "".join(
                "@RG\t" + "\t".join(f"{k}:{v}" for k, v in rg.items()) + "\n"
                for rg in header.read_groups
            )
        tb = text.encode()
        head = [b"BAM\x01", struct.pack("<i", len(tb)), tb, struct.pack("<i", len(header.sequences))]
        for s in header.sequences:
            nb = s.name.encode() + b"\x00"
            head.append(struct.pack("<i", len(nb)) + nb + struct.pack("<i", s.length))
        self._chunks.append(b"".join(head))

    def write(self, r: Read):
        nb = r.name.encode() + b"\x00"
        l_seq = len(r.bases)
        cigar_raw = (r.cigar_lens.astype(np.uint32) << 4) | r.cigar_ops.astype(np.uint32)
        codes = sam._CHAR_TO_NT16[r.bases]
        if l_seq % 2:
            codes = np.concatenate([codes, np.zeros(1, np.uint8)])
        seq4 = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)
        tags = encode_tags(r.tags)
        body = (
            struct.pack(
                "<iiIHHiiii",
                r.ref_id, r.pos,
                len(nb) | (r.mapq << 8) | (_reg2bin(max(r.pos, 0), max(r.end, r.pos + 1)) << 16),
                len(r.cigar_ops), r.flag, l_seq, r.mate_ref_id, r.mate_pos, r.tlen,
            )
            + nb
            + cigar_raw.astype("<u4").tobytes()
            + seq4.tobytes()
            + r.quals.astype(np.uint8).tobytes()
            + tags
        )
        self._chunks.append(struct.pack("<i", len(body)) + body)

    def close(self):
        payload = b"".join(self._chunks)
        with open(self.path, "wb") as fh:
            fh.write(bgzf.compress_bytes(payload))


def _reg2bin(beg: int, end: int) -> int:
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0
