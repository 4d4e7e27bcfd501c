"""Walker traversal framework.

Reference: engine/GATKTool.java:726-1125 (lifecycle onStartup →
onTraversalStart → traverse → onTraversalSuccess → closeTool, data-source
initialization order reference → reads → features → intervals) and the
traversal base classes ReadWalker / LocusWalker (via LocusIteratorByState) /
IntervalWalker / VariantWalker (engine/*.java).

Tools subclass a walker, implement apply(), and get for free: reads/reference/
feature wiring, interval handling, the default read-filter stack with
per-filter rejection counts (CountingReadFilter summaries), and ProgressMeter
throughput lines.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io import vcf as vcfio
from . import filters as filterlib
from .intervals import Interval, parse_interval
from .progress import ProgressMeter


@dataclass
class ReferenceContext:
    """Windowed reference access around the current datum
    (engine/ReferenceContext.java)."""
    reference: object
    contig: str
    start: int
    end: int

    def bases(self, lead: int = 0, trail: int = 0) -> bytes:
        if self.reference is None:
            return b""
        lo = max(0, self.start - lead)
        return self.reference.fetch_bytes(self.contig, lo, self.end + trail)


class GATKTool:
    """Lifecycle template (CommandLineProgram.runTool + GATKTool)."""

    tool_name = "GATKTool"
    requires_reference = False
    default_read_filters = list(filterlib.HC_DEFAULT_FILTER_NAMES)
    progress_unit = "reads"

    def __init__(self, reads_path=None, reference_path=None, intervals=None,
                 variant_path=None, read_filters=(), disable_read_filters=(),
                 min_mapping_quality=None):
        self.reads_path = reads_path
        self.reference_path = reference_path
        self.variant_path = variant_path
        self.intervals_arg = intervals
        self.reference = None
        self.reads = None
        self.targets = None
        self.filter_stack = filterlib.build_filter_stack(
            self.default_read_filters, enable=read_filters,
            disable=disable_read_filters, min_mapping_quality=min_mapping_quality)
        self.progress = ProgressMeter(self.tool_name, unit=self.progress_unit)

    # ---- data-source init (GATKTool.onStartup order :726-751) ----

    def on_startup(self):
        if self.reference_path:
            from ..io import fasta

            self.reference = fasta.FastaReference(self.reference_path)
        elif self.requires_reference:
            raise ValueError(f"{self.tool_name} requires a reference (-R)")
        if self.reads_path:
            from ..io.cram import open_reads

            self.reads = open_reads(self.reads_path, reference=self.reference)
        self._init_intervals()

    def _init_intervals(self):
        if self.reads is not None:
            lengths = {s.name: s.length for s in self.reads.header.sequences}
        elif self.reference is not None:
            lengths = {name: self.reference.contig_length(name)
                       for name in self.reference.index}
        else:
            lengths = {}
        if self.intervals_arg:
            from .intervals import parse_intervals_arg

            self.targets = parse_intervals_arg(self.intervals_arg, lengths)
        else:
            self.targets = [Interval(n, 0, l) for n, l in lengths.items()]

    # ---- template methods ----

    def on_traversal_start(self):
        pass

    def traverse(self):
        raise NotImplementedError

    def on_traversal_success(self):
        pass

    def close_tool(self):
        pass

    def run(self):
        self.on_startup()
        self.on_traversal_start()
        self.progress.start()
        self.traverse()
        self.progress.stop()
        for line in self.filter_stack.summary_lines():
            print(line)
        result = self.on_traversal_success()
        self.close_tool()
        return result

    def _reads_over_targets(self):
        for target in self.targets:
            for read in self.reads.query(target.contig, target.start, target.end):
                if self.filter_stack(read):
                    yield target, read


class ReadWalker(GATKTool):
    """apply(read, reference_context) per passing read (engine/ReadWalker.java)."""

    def apply(self, read, ref_context: ReferenceContext):
        raise NotImplementedError

    def traverse(self):
        for target, read in self._reads_over_targets():
            ctx = ReferenceContext(self.reference, target.contig, read.pos, read.end)
            self.apply(read, ctx)
            self.progress.update(f"{target.contig}:{read.pos + 1}")


class IntervalWalker(GATKTool):
    """apply(interval) per -L interval (engine/IntervalWalker.java)."""

    progress_unit = "intervals"

    def apply(self, interval: Interval):
        raise NotImplementedError

    def traverse(self):
        for target in self.targets:
            self.apply(target)
            self.progress.update(f"{target.contig}:{target.end}")


class LocusWalker(GATKTool):
    """apply(contig, pos, pileup columns) per covered locus — the
    LocusIteratorByState equivalent built from expanded read matrices
    (engine/LocusWalker.java)."""

    progress_unit = "loci"

    def apply(self, contig: str, pos: int, bases: np.ndarray, quals: np.ndarray,
              mapqs: np.ndarray):
        raise NotImplementedError

    def traverse(self):
        from . import pileup as pileup_mod

        for target in self.targets:
            span = target.end - target.start
            depth_bases: dict[int, list] = {}
            for read in self.reads.query(target.contig, target.start, target.end):
                if not self.filter_stack(read):
                    continue
                pos, base, qual, _flags = pileup_mod.expand_read(read)
                sel = (pos >= target.start) & (pos < target.end)
                for p, b, q in zip(pos[sel], base[sel], qual[sel]):
                    depth_bases.setdefault(int(p), []).append((int(b), int(q), read.mapq))
            for p in sorted(depth_bases):
                rows = depth_bases[p]
                self.apply(target.contig, p,
                           np.array([r[0] for r in rows], np.uint8),
                           np.array([r[1] for r in rows], np.uint8),
                           np.array([r[2] for r in rows], np.int32))
                self.progress.update(f"{target.contig}:{p + 1}")


class VariantWalker(GATKTool):
    """apply(variant) per record of the driving VCF (engine/VariantWalkerBase.java)."""

    progress_unit = "variants"

    def on_startup(self):
        super().on_startup()
        self.variant_reader = vcfio.VcfReader(self.variant_path)
        if not self.targets and not self.intervals_arg:
            self.targets = None

    def apply(self, variant):
        raise NotImplementedError

    def traverse(self):
        targets = self.targets if self.intervals_arg else None
        for v in self.variant_reader:
            if targets is not None and not any(
                    v.contig == t.contig and t.start <= v.pos < t.end for t in targets):
                continue
            self.apply(v)
            self.progress.update(f"{v.contig}:{v.pos + 1}")
