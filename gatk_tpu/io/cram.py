"""CRAM 2.1 / 3.0 reader.

Reference-equivalent of htsjdk's CRAM support used by
engine/ReadsPathDataSource.java:50 (GATK opens CRAM inputs through htsjdk with
a required reference). Implements the CRAM specification's container / slice /
block structure, the core bit-stream codecs (canonical Huffman, beta, gamma,
subexponential), external block compression (raw, gzip, bzip2, lzma, and the
CRAM 3.0 rANS 4x8 order-0/1 entropy codec), data-series decoding in htslib
record order, substitution-matrix base reconstruction against the reference,
in-slice mate resolution, and .crai indexed queries.

Decoded records are the same `Read` objects the BAM reader produces, so every
downstream tool works on CRAM inputs unchanged.
"""
from __future__ import annotations

import bz2
import gzip
import io
import lzma
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

from . import sam
from .reads import Read

CRAM_MAGIC = b"CRAM"

# block compression methods
RAW, GZIP, BZIP2, LZMA, RANS = 0, 1, 2, 3, 4
# block content types
FILE_HEADER, COMPRESSION_HEADER, SLICE_HEADER, EXTERNAL, CORE = 0, 1, 2, 4, 5

BAM_FUNMAP = 0x4
BAM_FREVERSE = 0x10
BAM_FMREVERSE = 0x20
BAM_FMUNMAP = 0x8
BAM_FPAIRED = 0x1

CF_QS_PRESERVED = 0x1
CF_DETACHED = 0x2
CF_HAS_MATE_DOWNSTREAM = 0x4
CF_UNKNOWN_BASES = 0x8


class _ByteStream:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def int32(self) -> int:
        v = struct.unpack_from("<i", self.data, self.pos)[0]
        self.pos += 4
        return v

    def itf8(self) -> int:
        b0 = self.byte()
        if b0 < 0x80:
            v = b0
        elif b0 < 0xC0:
            v = ((b0 & 0x7F) << 8) | self.byte()
        elif b0 < 0xE0:
            v = ((b0 & 0x3F) << 16) | (self.byte() << 8) | self.byte()
        elif b0 < 0xF0:
            v = ((b0 & 0x1F) << 24) | (self.byte() << 16) | (self.byte() << 8) | self.byte()
        else:
            v = ((b0 & 0x0F) << 28) | (self.byte() << 20) | (self.byte() << 12) \
                | (self.byte() << 4) | (self.byte() & 0x0F)
        if v >= 1 << 31:
            v -= 1 << 32
        return v

    def ltf8(self) -> int:
        b0 = self.byte()
        if b0 < 0x80:
            return b0
        if b0 < 0xC0:
            return ((b0 & 0x7F) << 8) | self.byte()
        if b0 < 0xE0:
            return ((b0 & 0x3F) << 16) | int.from_bytes(self.read(2), "big")
        if b0 < 0xF0:
            return ((b0 & 0x1F) << 24) | int.from_bytes(self.read(3), "big")
        if b0 < 0xF8:
            return ((b0 & 0x0F) << 32) | int.from_bytes(self.read(4), "big")
        if b0 < 0xFC:
            return ((b0 & 0x07) << 40) | int.from_bytes(self.read(5), "big")
        if b0 < 0xFE:
            return ((b0 & 0x03) << 48) | int.from_bytes(self.read(6), "big")
        if b0 == 0xFE:
            return int.from_bytes(self.read(7), "big")
        v = int.from_bytes(self.read(8), "big")
        if v >= 1 << 63:
            v -= 1 << 64
        return v

    def itf8_array(self):
        return [self.itf8() for _ in range(self.itf8())]

    def eof(self) -> bool:
        return self.pos >= len(self.data)


class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 7

    def read_bit(self) -> int:
        b = (self.data[self.pos] >> self.bit) & 1
        if self.bit == 0:
            self.bit = 7
            self.pos += 1
        else:
            self.bit -= 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


# ----------------------------------------------------------------------------
# rANS 4x8 (CRAM 3.0 §13; htslib rANS_static.c)
# ----------------------------------------------------------------------------

RANS_LOW = 1 << 23
TF_SHIFT = 12
TOTFREQ = 1 << TF_SHIFT


def _read_rans_freqs0(st: _ByteStream):
    """Order-0 frequency table with symbol run-length encoding."""
    freq = np.zeros(256, np.uint32)
    sym = st.byte()
    rle = 0
    while True:
        f = st.byte()
        if f >= 128:
            f = ((f & 127) << 8) | st.byte()
        freq[sym] = f
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            nxt = st.byte()
            if nxt == sym + 1:
                rle = st.byte()
                sym = nxt
            elif nxt == 0:
                break
            else:
                sym = nxt
    cum = np.zeros(257, np.uint32)
    cum[1:] = np.cumsum(freq)
    # slot -> symbol lookup
    ssym = np.zeros(TOTFREQ, np.uint8)
    for s in range(256):
        if freq[s]:
            ssym[cum[s]:cum[s + 1]] = s
    return freq, cum[:256], ssym


def _rans_decode_0(st: _ByteStream, out_sz: int) -> bytes:
    freq, cum, ssym = _read_rans_freqs0(st)
    data, p = st.data, st.pos
    R = list(struct.unpack_from("<4I", data, p))
    p += 16
    out = bytearray(out_sz)
    for i in range(out_sz):
        j = i & 3
        x = R[j]
        m = x & (TOTFREQ - 1)
        s = ssym[m]
        out[i] = s
        x = int(freq[s]) * (x >> TF_SHIFT) + m - int(cum[s])
        while x < RANS_LOW:
            x = (x << 8) | data[p]
            p += 1
        R[j] = x
    st.pos = p
    return bytes(out)


def _rans_decode_1(st: _ByteStream, out_sz: int) -> bytes:
    # order-1: per-context tables, same symbol RLE at the outer level
    freqs = {}
    ctx = st.byte()
    rle_i = 0
    while True:
        freqs[ctx] = _read_rans_freqs0(st)
        if rle_i > 0:
            rle_i -= 1
            ctx += 1
        else:
            nxt = st.byte()
            if nxt == ctx + 1:
                rle_i = st.byte()
                ctx = nxt
            elif nxt == 0:
                break
            else:
                ctx = nxt
    data, p = st.data, st.pos
    R = list(struct.unpack_from("<4I", data, p))
    p += 16
    out = bytearray(out_sz)
    isz4 = out_sz >> 2
    L = [0, 0, 0, 0]
    for i in range(isz4):
        for j in range(4):
            x = R[j]
            m = x & (TOTFREQ - 1)
            freq, cum, ssym = freqs.get(L[j]) or freqs[0]
            s = ssym[m]
            out[j * isz4 + i] = s
            x = int(freq[s]) * (x >> TF_SHIFT) + m - int(cum[s])
            while x < RANS_LOW:
                x = (x << 8) | data[p]
                p += 1
            R[j] = x
            L[j] = s
    # tail handled by state 3
    for i in range(4 * isz4, out_sz):
        x = R[3]
        m = x & (TOTFREQ - 1)
        freq, cum, ssym = freqs.get(L[3]) or freqs[0]
        s = ssym[m]
        out[i] = s
        x = int(freq[s]) * (x >> TF_SHIFT) + m - int(cum[s])
        while x < RANS_LOW and p < len(data):
            x = (x << 8) | data[p]
            p += 1
        R[3] = x
        L[3] = s
    st.pos = p
    return bytes(out)


def rans_uncompress(blob: bytes) -> bytes:
    if not blob:
        return b""
    st = _ByteStream(blob)
    order = st.byte()
    st.int32()  # compressed size
    out_sz = st.int32()
    if out_sz == 0:
        return b""
    return _rans_decode_0(st, out_sz) if order == 0 else _rans_decode_1(st, out_sz)


def _uncompress(method: int, data: bytes, raw_size: int) -> bytes:
    if method == RAW:
        return data
    if method == GZIP:
        return gzip.decompress(data)
    if method == BZIP2:
        return bz2.decompress(data)
    if method == LZMA:
        return lzma.decompress(data)
    if method == RANS:
        return rans_uncompress(data)
    raise ValueError(f"unsupported CRAM block compression method {method}")


# ----------------------------------------------------------------------------
# encodings (CRAM spec §12)
# ----------------------------------------------------------------------------

E_NULL, E_EXTERNAL, E_GOLOMB, E_HUFFMAN, E_BYTE_ARRAY_LEN, E_BYTE_ARRAY_STOP, \
    E_BETA, E_SUBEXP, E_GOLOMB_RICE, E_GAMMA = range(10)


def _parse_encoding(st: _ByteStream):
    codec = st.itf8()
    n = st.itf8()
    params = _ByteStream(st.read(n))
    if codec == E_NULL:
        return ("null",)
    if codec == E_EXTERNAL:
        return ("external", params.itf8())
    if codec == E_HUFFMAN:
        alphabet = params.itf8_array()
        lengths = params.itf8_array()
        return ("huffman", alphabet, lengths)
    if codec == E_BYTE_ARRAY_LEN:
        len_enc = _parse_encoding(params)
        val_enc = _parse_encoding(params)
        return ("byte_array_len", len_enc, val_enc)
    if codec == E_BYTE_ARRAY_STOP:
        stop = params.byte()
        ext_id = params.itf8()
        return ("byte_array_stop", stop, ext_id)
    if codec == E_BETA:
        offset = params.itf8()
        nbits = params.itf8()
        return ("beta", offset, nbits)
    if codec == E_SUBEXP:
        offset = params.itf8()
        k = params.itf8()
        return ("subexp", offset, k)
    if codec == E_GAMMA:
        return ("gamma", params.itf8())
    raise ValueError(f"unsupported CRAM encoding {codec}")


class _Decoder:
    """Evaluates one encoding against the slice's core bits / external streams."""

    def __init__(self, enc, core: _BitReader, external: dict):
        self.enc = enc
        self.core = core
        self.external = external
        if enc[0] == "huffman":
            alphabet, lengths = enc[1], enc[2]
            if all(l == 0 for l in lengths):
                # empty alphabets appear for unused legacy series (TC/TN)
                self.hval = alphabet[0] if alphabet else 0
                self.htable = None
            else:
                # canonical codes: sort by (length, order of appearance)
                order = sorted(range(len(alphabet)), key=lambda i: (lengths[i], i))
                table = {}
                code, prev_len = 0, 0
                for i in order:
                    code <<= lengths[i] - prev_len
                    table[(lengths[i], code)] = alphabet[i]
                    code += 1
                    prev_len = lengths[i]
                self.htable = table

    def read_int(self) -> int:
        e = self.enc
        kind = e[0]
        if kind == "external":
            return self.external[e[1]].itf8()
        if kind == "huffman":
            if self.htable is None:
                return self.hval
            code, ln = 0, 0
            while True:
                code = (code << 1) | self.core.read_bit()
                ln += 1
                if (ln, code) in self.htable:
                    return self.htable[(ln, code)]
                if ln > 31:
                    raise ValueError("bad huffman stream")
        if kind == "beta":
            return self.core.read_bits(e[2]) - e[1]
        if kind == "gamma":
            ln = 0
            while self.core.read_bit() == 0:
                ln += 1
            v = 1
            for _ in range(ln):
                v = (v << 1) | self.core.read_bit()
            return v - e[1]
        if kind == "subexp":
            offset, k = e[1], e[2]
            u = 0
            while self.core.read_bit() == 1:
                u += 1
            if u == 0:
                n = self.core.read_bits(k)
            else:
                b = u + k - 1
                n = (1 << b) | self.core.read_bits(b)
            return n - offset
        raise ValueError(f"cannot read int from encoding {kind}")

    def read_byte(self) -> int:
        e = self.enc
        if e[0] == "external":
            return self.external[e[1]].byte()
        return self.read_int()

    def read_bytes_len(self, n: int) -> bytes:
        e = self.enc
        if e[0] == "external":
            return self.external[e[1]].read(n)
        return bytes(self.read_byte() for _ in range(n))

    def read_byte_array(self, length_dec=None) -> bytes:
        e = self.enc
        if e[0] == "byte_array_stop":
            stream = self.external[e[2]]
            data = stream.data
            end = data.index(e[1], stream.pos)
            out = data[stream.pos:end]
            stream.pos = end + 1
            return out
        if e[0] == "byte_array_len":
            ln = _Decoder(e[1], self.core, self.external).read_int()
            return _Decoder(e[2], self.core, self.external).read_bytes_len(ln)
        raise ValueError(f"cannot read byte array from encoding {e[0]}")


# ----------------------------------------------------------------------------
# container structures
# ----------------------------------------------------------------------------

@dataclass
class Block:
    method: int
    content_type: int
    content_id: int
    data: bytes  # uncompressed


def _file_itf8(fh) -> int:
    b0 = fh.read(1)
    if not b0:
        raise EOFError
    b0 = b0[0]
    extra = 0 if b0 < 0x80 else 1 if b0 < 0xC0 else 2 if b0 < 0xE0 else 3 if b0 < 0xF0 else 4
    raw = bytes([b0]) + fh.read(extra)
    return _ByteStream(raw).itf8()


def _read_block(fh, version: int) -> Block:
    head = fh.read(2)
    if len(head) < 2:
        raise EOFError
    method, ctype = head[0], head[1]
    content_id = _file_itf8(fh)
    comp_size = _file_itf8(fh)
    raw_size = _file_itf8(fh)
    payload = fh.read(comp_size)
    if version >= 3:
        fh.read(4)  # crc32
    return Block(method, ctype, content_id, _uncompress(method, payload, raw_size))


@dataclass
class ContainerHeader:
    length: int
    ref_id: int
    start: int
    span: int
    n_records: int
    record_counter: int
    bases: int
    n_blocks: int
    landmarks: list


def _read_container_header(fh, version: int):
    raw = fh.read(4)
    if len(raw) < 4:
        return None
    length = struct.unpack("<i", raw)[0]
    # read a generous chunk for the varint fields (landmark arrays can be
    # hundreds of bytes in many-block containers)
    buf = fh.read(4096)
    st = _ByteStream(buf)
    ref_id = st.itf8()
    start = st.itf8()
    span = st.itf8()
    n_records = st.itf8()
    record_counter = st.ltf8() if version >= 3 else st.itf8()
    bases = st.ltf8() if version >= 3 else st.itf8()
    n_blocks = st.itf8()
    landmarks = st.itf8_array()
    if version >= 3:
        st.read(4)  # crc32
    # rewind extra bytes
    fh.seek(st.pos - len(buf), 1)
    return ContainerHeader(length, ref_id, start, span, n_records,
                           record_counter, bases, n_blocks, landmarks)


@dataclass
class CompressionHeader:
    read_names_included: bool = True
    ap_delta: bool = True
    reference_required: bool = True
    substitution_matrix: bytes = b"\x00" * 5
    tag_dict: list = field(default_factory=list)  # list of [(tag, type), ...]
    data_series: dict = field(default_factory=dict)  # "BF" -> encoding
    tag_encodings: dict = field(default_factory=dict)  # int key -> encoding


def _read_compression_header(data: bytes) -> CompressionHeader:
    st = _ByteStream(data)
    ch = CompressionHeader()
    # preservation map
    st.itf8()  # size in bytes
    for _ in range(st.itf8()):
        key = st.read(2)
        if key == b"RN":
            ch.read_names_included = st.byte() != 0
        elif key == b"AP":
            ch.ap_delta = st.byte() != 0
        elif key == b"RR":
            ch.reference_required = st.byte() != 0
        elif key == b"SM":
            ch.substitution_matrix = st.read(5)
        elif key == b"TD":
            raw = st.read(st.itf8())
            for line in raw.split(b"\x00")[:-1] if raw.endswith(b"\x00") else raw.split(b"\x00"):
                tags = []
                for i in range(0, len(line) - 2, 3):
                    tags.append((line[i:i + 2].decode(), chr(line[i + 2])))
                ch.tag_dict.append(tags)
            if not ch.tag_dict:
                ch.tag_dict = [[]]
        else:
            raise ValueError(f"unknown preservation key {key}")
    # data series encodings
    st.itf8()
    for _ in range(st.itf8()):
        key = st.read(2).decode()
        ch.data_series[key] = _parse_encoding(st)
    # tag encodings
    st.itf8()
    for _ in range(st.itf8()):
        key = st.itf8()
        ch.tag_encodings[key] = _parse_encoding(st)
    return ch


@dataclass
class SliceHeader:
    ref_id: int
    start: int
    span: int
    n_records: int
    record_counter: int
    n_blocks: int
    content_ids: list
    embedded_ref_id: int
    ref_md5: bytes


def _read_slice_header(data: bytes, version: int) -> SliceHeader:
    st = _ByteStream(data)
    ref_id = st.itf8()
    start = st.itf8()
    span = st.itf8()
    n_records = st.itf8()
    record_counter = st.ltf8() if version >= 3 else st.itf8()
    n_blocks = st.itf8()
    content_ids = st.itf8_array()
    embedded_ref = st.itf8()
    md5 = st.read(16)
    return SliceHeader(ref_id, start, span, n_records, record_counter,
                       n_blocks, content_ids, embedded_ref, md5)


# ----------------------------------------------------------------------------
# record decoding
# ----------------------------------------------------------------------------

_SUB_BASES = b"ACGTN"

_TAG_FMT = {"c": "<b", "C": "<B", "s": "<h", "S": "<H", "i": "<i", "I": "<I", "f": "<f"}
_ARR_FMT = {ord("c"): ("<b", 1), ord("C"): ("<B", 1), ord("s"): ("<h", 2),
            ord("S"): ("<H", 2), ord("i"): ("<i", 4), ord("I"): ("<I", 4),
            ord("f"): ("<f", 4)}


def _decode_tag_value(type_char: str, raw: bytes):
    if type_char == "A":
        return chr(raw[0])
    if type_char in _TAG_FMT:
        return struct.unpack(_TAG_FMT[type_char], raw[:struct.calcsize(_TAG_FMT[type_char])])[0]
    if type_char in ("Z", "H"):
        return raw.rstrip(b"\x00").decode("ascii", "replace")
    if type_char == "B":
        sub = raw[0]
        n = struct.unpack_from("<i", raw, 1)[0]
        fmt, sz = _ARR_FMT[sub]
        vals = [struct.unpack_from(fmt, raw, 5 + i * sz)[0] for i in range(n)]
        return (chr(sub), vals)
    return raw


def _build_sub_table(matrix: bytes):
    """substitution matrix: per ref base (ACGTN order) one byte packing the
    2-bit codes of the 4 substitution bases in ACGTN order."""
    table = {}
    for ri, ref_base in enumerate(_SUB_BASES):
        byte = matrix[ri]
        subs = [b for b in _SUB_BASES if b != ref_base]
        shift = 6
        for sb in subs:
            code = (byte >> shift) & 3
            table[(ref_base, code)] = sb
            shift -= 2
    return table


class CramReader:
    """Iterates Read objects from a CRAM 2.1/3.0 file.

    reference: FastaReference (required unless slices embed their reference,
    mirroring GATK's CRAM -R requirement)."""

    def __init__(self, path: str, reference=None):
        self.path = path
        self.reference = reference
        self._fh = open(path, "rb")
        magic = self._fh.read(4)
        if magic != CRAM_MAGIC:
            raise ValueError(f"{path} is not a CRAM file")
        ver = self._fh.read(2)
        self.version = ver[0]
        if self.version not in (2, 3):
            raise ValueError(f"unsupported CRAM version {ver[0]}.{ver[1]}")
        self._fh.read(20)  # file id
        self.header = self._read_file_header()
        self._containers_start = self._fh.tell()

    def _read_file_header(self) -> sam.SamHeader:
        ch = _read_container_header(self._fh, self.version)
        end = self._fh.tell() + ch.length
        block = _read_block(self._fh, self.version)
        st = _ByteStream(block.data)
        text_len = st.int32()
        text = st.read(text_len).decode("ascii", "replace")
        self._fh.seek(end)
        return sam.SamHeader.parse(text)

    # ---- iteration ----

    def __iter__(self):
        self._fh.seek(self._containers_start)
        while True:
            try:
                ch = _read_container_header(self._fh, self.version)
            except (EOFError, IndexError):
                return
            if ch is None or (ch.ref_id == -1 and ch.start == 4542278):  # EOF container
                return
            end = self._fh.tell() + ch.length
            if ch.n_records == 0:
                self._fh.seek(end)
                continue
            yield from self._decode_container(ch)
            self._fh.seek(end)

    def query(self, contig: str, start: int, end: int):
        """Interval query via the .crai index when present, else a full scan."""
        rid = self.header.index_of(contig) if hasattr(self.header, "index_of") else \
            next(i for i, s in enumerate(self.header.sequences) if s.name == contig)
        try:
            entries = self._load_crai()
        except OSError:
            entries = None
        if entries is None:
            for r in self:
                if r.ref_id == rid and r.pos < end and r.end > start:
                    yield r
            return
        offsets = sorted({e[3] for e in entries
                          if e[0] == rid and e[1] < end and e[1] + e[2] > start})
        for off in offsets:
            self._fh.seek(off)
            ch = _read_container_header(self._fh, self.version)
            if ch is None:
                continue
            for r in self._decode_container(ch):
                if r.ref_id == rid and r.pos < end and r.end > start:
                    yield r

    def _load_crai(self):
        entries = []
        with gzip.open(self.path + ".crai", "rt") as fh:
            for line in fh:
                parts = line.split("\t")
                entries.append(tuple(int(x) for x in parts[:6]))
        return entries

    # ---- container decode ----

    def _decode_container(self, ch: ContainerHeader):
        comp_block = _read_block(self._fh, self.version)
        assert comp_block.content_type == COMPRESSION_HEADER
        comp = _read_compression_header(comp_block.data)
        records = []
        blocks_read = 1
        while blocks_read < ch.n_blocks:
            block = _read_block(self._fh, self.version)
            blocks_read += 1
            if block.content_type != SLICE_HEADER:
                continue
            sh = _read_slice_header(block.data, self.version)
            slice_blocks = []
            for _ in range(sh.n_blocks):
                slice_blocks.append(_read_block(self._fh, self.version))
                blocks_read += 1
            records.extend(self._decode_slice(comp, sh, slice_blocks))
        return records

    def _decode_slice(self, comp: CompressionHeader, sh: SliceHeader, blocks):
        core = _BitReader(next(b.data for b in blocks if b.content_type == CORE))
        external = {b.content_id: _ByteStream(b.data)
                    for b in blocks if b.content_type == EXTERNAL}
        dec = {}
        for key, enc in comp.data_series.items():
            dec[key] = _Decoder(enc, core, external)
        tag_dec = {k: _Decoder(e, core, external) for k, e in comp.tag_encodings.items()}
        sub_table = _build_sub_table(comp.substitution_matrix)

        embedded_ref = None
        if sh.embedded_ref_id >= 0 and sh.embedded_ref_id in external:
            embedded_ref = external[sh.embedded_ref_id].data

        def ref_fetch(rid, start0, length):
            """reference bases [start0, start0+length), uppercase ASCII."""
            if embedded_ref is not None:
                off = start0 - (sh.start - 1)
                return embedded_ref[off:off + length]
            if self.reference is None:
                return b"N" * length
            name = self.header.sequences[rid].name
            return self.reference.fetch_bytes(name, start0, start0 + length).upper()

        records = []
        mate_links = []
        prev_ap = sh.start
        for idx in range(sh.n_records):
            bf = dec["BF"].read_int()
            cf = dec["CF"].read_int()
            rid = sh.ref_id
            if sh.ref_id == -2:
                rid = dec["RI"].read_int()
            rl = dec["RL"].read_int()
            if comp.ap_delta:
                ap = prev_ap + dec["AP"].read_int()
                prev_ap = ap
            else:
                ap = dec["AP"].read_int()
            rg = dec["RG"].read_int() if "RG" in dec else -1
            name = b""
            if comp.read_names_included and "RN" in dec:
                name = dec["RN"].read_byte_array()
            mate_ref, mate_pos, tlen = -1, -1, 0
            if cf & CF_DETACHED:
                mf = dec["MF"].read_int()
                if not comp.read_names_included and "RN" in dec:
                    name = dec["RN"].read_byte_array()
                mate_ref = dec["NS"].read_int()
                mate_pos = dec["NP"].read_int() - 1
                tlen = dec["TS"].read_int()
                if mf & 1:
                    bf |= BAM_FMREVERSE
                if mf & 2:
                    bf |= BAM_FMUNMAP
            elif cf & CF_HAS_MATE_DOWNSTREAM:
                nf = dec["NF"].read_int()
                mate_links.append((idx, idx + nf + 1))
            tags = {}
            tl = dec["TL"].read_int() if "TL" in dec else 0
            for tag, tchar in comp.tag_dict[tl] if tl < len(comp.tag_dict) else []:
                key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(tchar)
                raw = tag_dec[key].read_byte_array()
                tags[tag] = _decode_tag_value(tchar, raw)
            if rg >= 0 and rg < len(self.header.read_groups):
                tags["RG"] = self.header.read_groups[rg].get("ID", str(rg))

            if not (bf & BAM_FUNMAP):
                read = self._decode_mapped(dec, comp, sub_table, ref_fetch,
                                           rid, ap, rl, cf, core)
                bases, quals, cig_ops, cig_lens, mapq, nm = read
                if "NM" not in tags and self.reference is not None:
                    # htsjdk regenerates NM from the reference on CRAM decode
                    tags["NM"] = nm
            else:
                if cf & CF_UNKNOWN_BASES:
                    bases = b"N" * rl
                else:
                    bases = bytes(dec["BA"].read_byte() for _ in range(rl))
                if cf & CF_QS_PRESERVED:
                    quals = dec["QS"].read_bytes_len(rl)
                else:
                    quals = b"\xff" * rl
                cig_ops = np.zeros(0, np.uint8)  # unmapped: no cigar
                cig_lens = np.zeros(0, np.int32)
                mapq = 0
            records.append(Read(
                name=name.decode("ascii", "replace") or f"cram:{sh.record_counter + idx}",
                flag=bf, ref_id=rid if rid >= 0 else -1,
                pos=ap - 1, mapq=mapq,
                cigar_ops=cig_ops, cigar_lens=cig_lens,
                bases=np.frombuffer(bases, np.uint8).copy(),
                quals=np.frombuffer(quals, np.uint8).copy(),
                mate_ref_id=mate_ref, mate_pos=mate_pos, tlen=tlen, tags=tags))

        # in-slice mate resolution (CRAM spec §10.3; htslib cram_decode.c)
        for i, j in mate_links:
            if j >= len(records):
                continue
            a, b = records[i], records[j]
            a.mate_ref_id, a.mate_pos = b.ref_id, b.pos
            b.mate_ref_id, b.mate_pos = a.ref_id, a.pos
            if b.flag & BAM_FREVERSE:
                a.flag |= BAM_FMREVERSE
            if b.flag & BAM_FUNMAP:
                a.flag |= BAM_FMUNMAP
            if a.flag & BAM_FREVERSE:
                b.flag |= BAM_FMREVERSE
            if a.flag & BAM_FUNMAP:
                b.flag |= BAM_FMUNMAP
            left = min(a.pos, b.pos)
            right = max(a.end, b.end)
            tlen = right - left
            if a.pos <= b.pos:
                a.tlen, b.tlen = tlen, -tlen
            else:
                a.tlen, b.tlen = -tlen, tlen
        return records

    def _decode_mapped(self, dec, comp, sub_table, ref_fetch, rid, ap, rl, cf, core):
        nf = dec["FN"].read_int()
        features = []
        fpos = 0
        for _ in range(nf):
            code = chr(dec["FC"].read_byte())
            fpos += dec["FP"].read_int()
            if code == "B":
                features.append((fpos, "B", dec["BA"].read_byte(), dec["QS"].read_byte()))
            elif code == "X":
                features.append((fpos, "X", dec["BS"].read_int()))
            elif code == "I":
                features.append((fpos, "I", dec["IN"].read_byte_array()))
            elif code == "S":
                features.append((fpos, "S", dec["SC"].read_byte_array()))
            elif code == "i":
                features.append((fpos, "i", dec["BA"].read_byte()))
            elif code == "b":
                features.append((fpos, "b", dec["BB"].read_byte_array()))
            elif code == "q":
                features.append((fpos, "q", dec["QQ"].read_byte_array()))
            elif code == "D":
                features.append((fpos, "D", dec["DL"].read_int()))
            elif code == "N":
                features.append((fpos, "N", dec["RS"].read_int()))
            elif code == "P":
                features.append((fpos, "P", dec["PD"].read_int()))
            elif code == "H":
                features.append((fpos, "H", dec["HC"].read_int()))
            elif code == "Q":
                features.append((fpos, "Q", dec["QS"].read_byte()))
            else:
                raise ValueError(f"unknown CRAM feature code {code!r}")
        mapq = dec["MQ"].read_int()

        # reconstruct bases + cigar by walking features (htslib cram_decode.c)
        bases = bytearray(rl)
        quals = bytearray(b"\xff" * rl)
        cigar = []  # (op, len)

        def add_cig(op, ln):
            if ln <= 0:
                return
            if cigar and cigar[-1][0] == op:
                cigar[-1][1] += ln
            else:
                cigar.append([op, ln])

        # fetch a generous reference window
        ref_window = ref_fetch(rid, ap - 1, rl + 1024)

        rpos = 0  # read offset (0-based)
        ref_off = 0  # offset into ref_window
        nm = 0  # edit distance vs reference (regenerated NM tag)

        def fill_match(upto):
            nonlocal rpos, ref_off
            n = upto - rpos
            if n <= 0:
                return
            seg = ref_window[ref_off:ref_off + n]
            bases[rpos:rpos + n] = seg.ljust(n, b"N")
            add_cig(0, n)
            rpos += n
            ref_off += n

        for feat in features:
            p1 = feat[0]  # 1-based read position
            kind = feat[1]
            fill_match(p1 - 1)
            if kind == "B":
                bases[rpos] = feat[2]
                quals[rpos] = feat[3]
                if ref_window[ref_off:ref_off + 1] != bytes([feat[2]]):
                    nm += 1
                add_cig(0, 1)
                rpos += 1
                ref_off += 1
            elif kind == "X":
                ref_base = ref_window[ref_off:ref_off + 1] or b"N"
                rb = ref_base[0]
                rb_chr = rb if rb in _SUB_BASES else ord("N")
                bases[rpos] = sub_table.get((rb_chr, feat[2]), ord("N"))
                nm += 1
                add_cig(0, 1)
                rpos += 1
                ref_off += 1
            elif kind == "I":
                ins = feat[2]
                bases[rpos:rpos + len(ins)] = ins
                nm += len(ins)
                add_cig(1, len(ins))
                rpos += len(ins)
            elif kind == "i":
                bases[rpos] = feat[2]
                nm += 1
                add_cig(1, 1)
                rpos += 1
            elif kind == "S":
                sc = feat[2]
                bases[rpos:rpos + len(sc)] = sc
                add_cig(4, len(sc))
                rpos += len(sc)
            elif kind == "b":
                bb = feat[2]
                bases[rpos:rpos + len(bb)] = bb
                add_cig(0, len(bb))
                rpos += len(bb)
                ref_off += len(bb)
            elif kind == "q":
                qq = feat[2]
                quals[rpos:rpos + len(qq)] = qq
            elif kind == "D":
                nm += feat[2]
                add_cig(2, feat[2])
                ref_off += feat[2]
            elif kind == "N":
                add_cig(3, feat[2])
                ref_off += feat[2]
            elif kind == "P":
                add_cig(6, feat[2])
            elif kind == "H":
                add_cig(5, feat[2])
            elif kind == "Q":
                quals[p1 - 1] = feat[2]
        fill_match(rl)

        if cf & CF_QS_PRESERVED:
            quals = bytearray(dec["QS"].read_bytes_len(rl))
        ops = np.array([c[0] for c in cigar], np.uint8)
        lens = np.array([c[1] for c in cigar], np.int32)
        return bytes(bases), bytes(quals), ops, lens, mapq, nm


def open_reads(path: str, reference=None):
    """ReadsPathDataSource-style dispatch: BAM or CRAM by magic/extension."""
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic == CRAM_MAGIC:
        return CramReader(path, reference=reference)
    from . import bam as bamio
    return bamio.BamReader(path)
