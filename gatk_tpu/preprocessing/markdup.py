"""Duplicate marking, matching MarkDuplicatesSpark / Picard MarkDuplicates output.

Reference behavior: tools/spark/transforms/markduplicates/MarkDuplicatesSpark.java
(:199-266 final marking), MarkDuplicatesSparkUtils.java (:102-240 record building,
:288-500 per-site resolution, :563-603 tie-break comparator),
utils/read/markduplicates/{ReadsKey,MarkDuplicatesScoringStrategy}.java,
sparkrecords/{Pair,Fragment,EmptyFragment}.java.
"""
from __future__ import annotations

import functools
from collections import defaultdict

from ..io import sam

MIN_BASE_QUAL = 15
UNKNOWN_LIBRARY = "Unknown Library"


def sum_of_base_qualities(read) -> int:
    q = read.quals
    return int(q[q >= MIN_BASE_QUAL].sum())


def score_read(read) -> int:
    s = min(sum_of_base_qualities(read), 32767 // 2)
    if read.fails_vendor_quality:
        s += -32768 // 2
    return s


def stranded_unclipped_start(read) -> int:
    return read.unclipped_end() if read.is_reverse else read.unclipped_start()


def _parse_location(name: str):
    """(tile, x, y) from the last 3 colon-separated numeric fields (htsjdk
    ReadNameParser default); (-1, -1, -1) if unparseable."""
    parts = name.split(":")
    if len(parts) >= 3:
        try:
            return int(parts[-3]), int(float(parts[-2])), int(float(parts[-1]))
        except ValueError:
            pass
    return -1, -1, -1


class _Record:
    __slots__ = ("name", "score", "r1r", "tile", "x", "y")

    def __init__(self, name, score, r1r):
        self.name = name
        self.score = score
        self.r1r = r1r
        self.tile, self.x, self.y = _parse_location(name)


def _tiebreak_cmp(a: _Record, b: _Record) -> int:
    """TransientFieldPhysicalLocationComparator (not reversed)."""
    if a.r1r != b.r1r:
        return -1 if a.r1r else 1
    if a.tile != b.tile:
        return a.tile - b.tile
    if a.x != b.x:
        return a.x - b.x
    if a.y != b.y:
        return a.y - b.y
    return (a.name > b.name) - (a.name < b.name)


def _best(records):
    """max by score; tie -> minimum under the location comparator."""
    return max(records, key=functools.cmp_to_key(
        lambda a, b: (a.score - b.score) or _tiebreak_cmp(b, a)))


def _library_of(read, rg_library: dict) -> str:
    rg = read.read_group
    return rg_library.get(rg, UNKNOWN_LIBRARY)


def _has_mapped_mate(read) -> bool:
    return read.is_paired and not read.mate_is_unmapped


def find_non_duplicate_names(reads, header):
    """Set of template names that survive duplicate marking (the 'best' of each
    duplicate set, plus passthroughs). reads: all reads (any order)."""
    rg_library = {}
    for rg in header.read_groups:
        rg_library[rg.get("ID")] = rg.get("LB") or UNKNOWN_LIBRARY

    by_name = defaultdict(list)
    for r in reads:
        if not r.is_unmapped and r.pos >= 0:
            by_name[r.name].append(r)

    frag_groups = defaultdict(list)   # fragment key -> [_Record]
    frag_empty = set()                # fragment keys with an EmptyFragment placeholder
    pair_groups = defaultdict(list)   # pair key -> [_Record]
    passthrough_names = set()

    for name, group in by_name.items():
        primaries = [r for r in group if not r.is_secondary and not r.is_supplementary]
        if not primaries:
            passthrough_names.add(name)
            continue
        if len(primaries) > 2:
            raise ValueError(f"template {name} has >2 primary reads")
        for r in primaries:
            fkey = (_library_of(r, rg_library), r.ref_id,
                    stranded_unclipped_start(r), r.is_reverse)
            if _has_mapped_mate(r):
                frag_empty.add(fkey)
            else:
                frag_groups[fkey].append(_Record(name, score_read(r), r.is_reverse))

        mapped_pair = [r for r in primaries if _has_mapped_mate(r)]
        if len(mapped_pair) == 2:
            r1, r2 = mapped_pair
            s1, s2 = stranded_unclipped_start(r1), stranded_unclipped_start(r2)
            if (r1.ref_id != r2.ref_id and r1.ref_id < r2.ref_id) or (
                r1.ref_id == r2.ref_id and s1 <= s2
            ):
                first, second = r1, r2
            else:
                first, second = r2, r1
            if (r1.ref_id == r2.ref_id and s1 == s2
                    and first.is_reverse and not second.is_reverse):
                first, second = second, first
            key = (
                _library_of(first, rg_library),
                first.ref_id, stranded_unclipped_start(first), first.is_reverse,
                second.ref_id, stranded_unclipped_start(second), second.is_reverse,
            )
            pair_groups[key].append(
                _Record(name, score_read(r1) + score_read(r2), first.is_reverse))
        elif len(mapped_pair) == 1:
            passthrough_names.add(name)

    non_dup = set(passthrough_names)
    for fkey, frags in frag_groups.items():
        if fkey in frag_empty:
            continue  # pairs at this site beat all fragments
        non_dup.add(_best(frags).name)
    for pkey, pairs in pair_groups.items():
        non_dup.add(_best(pairs).name)
    return non_dup


def mark_duplicates(reads, header, dont_mark_unmapped_mates: bool = False):
    """Set/clear the duplicate flag on every read in place
    (MarkDuplicatesSpark.mark:229-264). Returns (n_duplicates, non_dup_names)."""
    non_dup = find_non_duplicate_names(reads, header)
    n_dup = 0
    for read in reads:
        read.flag &= ~sam.DUPLICATE
        if read.name in non_dup:
            continue
        if read.is_unmapped and (not read.is_paired or read.mate_is_unmapped):
            continue  # fully unmapped templates are never duplicates
        if dont_mark_unmapped_mates and read.is_unmapped:
            continue
        read.flag |= sam.DUPLICATE
        n_dup += 1
    return n_dup, non_dup
