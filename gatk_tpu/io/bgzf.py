"""BGZF (blocked gzip) codec — the container format of BAM/tabix files.

Equivalent of htsjdk's BlockCompressedInputStream/OutputStream (the reference's I/O
foundation; GATK defaults to the Intel GKL deflater, CommandLineProgram.java — here we
use zlib, with a C++ accelerated path planned in native/).

A BGZF file is a series of gzip members, each with a BSIZE extra field giving the
total compressed block size; uncompressed payloads are <= 65536 bytes. Virtual file
offsets are (compressed_block_offset << 16) | offset_within_uncompressed_block.
"""
from __future__ import annotations

import struct
import zlib

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
_HEADER = struct.Struct("<4BI2B2H")  # magic..xlen


def _read_block_size(data: bytes, off: int) -> int:
    """Parse the BSIZE extra subfield of the gzip member starting at off."""
    if data[off : off + 2] != b"\x1f\x8b":
        raise ValueError(f"not a gzip block at offset {off}")
    xlen = struct.unpack_from("<H", data, off + 10)[0]
    xoff = off + 12
    end = xoff + xlen
    while xoff < end:
        si1, si2, slen = struct.unpack_from("<2BH", data, xoff)
        if si1 == 66 and si2 == 67:  # 'B','C'
            return struct.unpack_from("<H", data, xoff + 4)[0] + 1
        xoff += 4 + slen
    raise ValueError("BGZF BSIZE subfield missing")


def decompress_bytes(data: bytes) -> bytes:
    """Decompress a whole in-memory BGZF stream."""
    out = []
    off = 0
    n = len(data)
    while off < n:
        bsize = _read_block_size(data, off)
        # payload: skip gzip header (12 + xlen), end before CRC32+ISIZE (8 bytes)
        xlen = struct.unpack_from("<H", data, off + 10)[0]
        cstart = off + 12 + xlen
        cend = off + bsize - 8
        if cend > cstart:
            out.append(zlib.decompress(data[cstart:cend], wbits=-15))
        off += bsize
    return b"".join(out)


def decompress_file(path: str) -> bytes:
    with open(path, "rb") as fh:
        return decompress_bytes(fh.read())


class BgzfReader:
    """Random-access BGZF reader supporting virtual offsets (for BAI/tabix)."""

    def __init__(self, path: str):
        with open(path, "rb") as fh:
            self._data = fh.read()
        self._cache_coffset = -1
        self._cache_block = b""

    def _block_at(self, coffset: int) -> bytes:
        if coffset == self._cache_coffset:
            return self._cache_block
        data = self._data
        bsize = _read_block_size(data, coffset)
        xlen = struct.unpack_from("<H", data, coffset + 10)[0]
        cstart = coffset + 12 + xlen
        cend = coffset + bsize - 8
        block = zlib.decompress(data[cstart:cend], wbits=-15) if cend > cstart else b""
        self._cache_coffset = coffset
        self._cache_block = block
        self._cache_next = coffset + bsize
        return block

    def read_range(self, voffset_start: int, voffset_end: int) -> bytes:
        """Read uncompressed bytes between two virtual offsets."""
        out = []
        coff = voffset_start >> 16
        uoff = voffset_start & 0xFFFF
        end_coff = voffset_end >> 16
        end_uoff = voffset_end & 0xFFFF
        while True:
            block = self._block_at(coff)
            nxt = self._cache_next
            if coff == end_coff:
                out.append(block[uoff:end_uoff])
                break
            out.append(block[uoff:])
            uoff = 0
            coff = nxt
            if coff >= len(self._data):
                break
        return b"".join(out)


def compress_bytes(payload: bytes, level: int = 6) -> bytes:
    """Compress bytes into a BGZF stream (with EOF marker)."""
    out = []
    for off in range(0, len(payload), 65000):
        chunk = payload[off : off + 65000]
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 26
        header = struct.pack(
            "<4BIBBHBBHH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6, 66, 67, 2, bsize - 1
        )
        footer = struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk))
        out.append(header + cdata + footer)
    out.append(BGZF_EOF)
    return b"".join(out)
