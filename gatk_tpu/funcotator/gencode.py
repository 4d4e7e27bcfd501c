"""GENCODE datasource: GTF model + transcript sequences + variant classification.

Reference behavior: tools/funcotator/dataSources/gencode/
GencodeFuncotationFactory.java (variant classification against transcripts,
codon/protein change computation from the pc_transcripts FASTA),
FuncotatorUtils.java (coordinate mapping, codon translation),
tools/funcotator/Funcotator.java:717 (datasource config layout:
gencode.config with src_file + gencode_fasta_path).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

CODON_TABLE = {}
_BASES = "TCAG"
_AAS = ("FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG")
for _i, _a in enumerate(_BASES):
    for _j, _b in enumerate(_BASES):
        for _k, _c in enumerate(_BASES):
            CODON_TABLE[_a + _b + _c] = _AAS[16 * _i + 4 * _j + _k]

COMPLEMENT = str.maketrans("ACGTacgt", "TGCAtgca")


def revcomp(s: str) -> str:
    return s.translate(COMPLEMENT)[::-1]


@dataclass
class Transcript:
    transcript_id: str
    gene_name: str
    contig: str
    strand: str
    start: int  # 1-based inclusive
    end: int
    exons: list = field(default_factory=list)  # [(start, end)] 1-based, genomic order
    cds: list = field(default_factory=list)    # [(start, end)]
    tags: set = field(default_factory=set)
    transcript_type: str = ""
    sequence: str = ""       # spliced transcript sequence (transcript strand)
    cds_range: tuple = None  # (start, end) 1-based inclusive in transcript coords

    @property
    def cds_span(self):
        if not self.cds:
            return None
        return (min(s for s, _ in self.cds), max(e for _, e in self.cds))

    def genomic_to_transcript(self, pos: int):
        """1-based genomic -> 1-based transcript coordinate, or None if intronic."""
        exons = sorted(self.exons)
        offset = 0
        if self.strand == "+":
            for s, e in exons:
                if s <= pos <= e:
                    return offset + (pos - s) + 1
                offset += e - s + 1
        else:
            for s, e in sorted(exons, reverse=True):
                if s <= pos <= e:
                    return offset + (e - pos) + 1
                offset += e - s + 1
        return None

    def exon_number(self, pos: int):
        exons = sorted(self.exons, reverse=self.strand == "-")
        for i, (s, e) in enumerate(exons):
            if s <= pos <= e:
                return i + 1
        return None


def parse_gtf_attributes(s: str) -> dict:
    out = {}
    for item in s.strip().split(";"):
        item = item.strip()
        if not item:
            continue
        if " " in item:
            k, v = item.split(" ", 1)
            out[k] = v.strip().strip('"')
    return out


def load_gtf(path: str):
    """{transcript_id: Transcript} from a GENCODE GTF."""
    transcripts = {}
    with open(path) as fh:
        for ln in fh:
            if ln.startswith("#"):
                continue
            f = ln.rstrip("\n").split("\t")
            if len(f) < 9:
                continue
            feature = f[2]
            attrs = parse_gtf_attributes(f[8])
            tid = attrs.get("transcript_id")
            if feature == "transcript":
                transcripts[tid] = Transcript(
                    transcript_id=tid, gene_name=attrs.get("gene_name", ""),
                    contig=f[0], strand=f[6], start=int(f[3]), end=int(f[4]),
                    transcript_type=attrs.get("transcript_type", ""))
                if "tag" in attrs:
                    transcripts[tid].tags.add(attrs["tag"])
            elif feature in ("exon", "CDS") and tid in transcripts:
                t = transcripts[tid]
                span = (int(f[3]), int(f[4]))
                (t.exons if feature == "exon" else t.cds).append(span)
                if "tag" in attrs:
                    t.tags.add(attrs["tag"])
    return transcripts


def load_transcript_fasta(path: str):
    """{transcript_id: (sequence, cds_range)} from a gencode pc_transcripts FASTA."""
    out = {}
    tid = None
    cds = None
    seq = []

    def flush():
        if tid is not None:
            out[tid] = ("".join(seq), cds)

    with open(path) as fh:
        for ln in fh:
            ln = ln.rstrip("\n")
            if ln.startswith(">"):
                flush()
                parts = ln[1:].split("|")
                tid = parts[0]
                cds = None
                for p in parts:
                    if p.startswith("CDS:"):
                        a, b = p[4:].split("-")
                        cds = (int(a), int(b))
                seq = []
            else:
                seq.append(ln)
    flush()
    return out


class GencodeDataSource:
    def __init__(self, transcripts: dict, name="Gencode", version="19", build="hg19"):
        self.transcripts = transcripts
        self.name = name
        self.version = version
        self.build = build
        self._by_contig = {}
        for t in transcripts.values():
            self._by_contig.setdefault(t.contig, []).append(t)
            alias = t.contig[3:] if t.contig.startswith("chr") else "chr" + t.contig
            self._by_contig.setdefault(alias, []).append(t)

    @staticmethod
    def load(ds_dir: str, build: str = None):
        """Load from a funcotator datasource directory (gencode_*/<build>/gencode.config)."""
        config_path = None
        for root, _dirs, files in os.walk(ds_dir):
            if "gencode.config" in files:
                if build is None or os.path.basename(root) == build:
                    config_path = os.path.join(root, "gencode.config")
                    break
        if config_path is None:
            raise FileNotFoundError(f"no gencode.config under {ds_dir}")
        cfg = {}
        with open(config_path) as fh:
            for ln in fh:
                ln = ln.strip()
                if ln.startswith("#") or "=" not in ln:
                    continue
                k, v = ln.split("=", 1)
                cfg[k.strip()] = v.strip()
        base = os.path.dirname(config_path)
        transcripts = load_gtf(os.path.join(base, cfg["src_file"]))
        if cfg.get("gencode_fasta_path"):
            seqs = load_transcript_fasta(os.path.join(base, cfg["gencode_fasta_path"]))
            for tid, t in transcripts.items():
                if tid in seqs:
                    t.sequence, t.cds_range = seqs[tid]
        return GencodeDataSource(transcripts, cfg.get("name", "Gencode"),
                                 cfg.get("version", "19"),
                                 os.path.basename(base))

    def overlapping(self, contig, start1, end1):
        return [t for t in self._by_contig.get(contig, ())
                if t.start <= end1 and t.end >= start1]


# ---------------------------------------------------------------------------
# classification
# ---------------------------------------------------------------------------

SPLICE_SITE_WINDOW = 2
FLANK_5P = 5000
FLANK_3P = 0


@dataclass
class Funcotation:
    hugo_symbol: str = ""
    classification: str = "IGR"
    secondary: str = ""
    variant_type: str = "SNP"
    transcript_id: str = ""
    strand: str = ""
    exon: str = ""
    cdna_change: str = ""
    codon_change: str = ""
    protein_change: str = ""


def _variant_type(ref: str, alt: str) -> str:
    if len(ref) == 1 and len(alt) == 1:
        return "SNP"
    if len(ref) == len(alt):
        return {2: "DNP", 3: "TNP"}.get(len(ref), "ONP")
    return "INS" if len(alt) > len(ref) else "DEL"


def classify(contig: str, pos1: int, ref: str, alt: str, ds: GencodeDataSource,
             transcript_mode="CANONICAL") -> Funcotation:
    """Classify one variant against the datasource (best transcript)."""
    vt = _variant_type(ref, alt)
    end1 = pos1 + len(ref) - 1
    overlapping = ds.overlapping(contig, pos1, end1)
    if not overlapping:
        flank = [t for t in ds.overlapping(contig, pos1 - FLANK_3P - 1, end1 + FLANK_5P)]
        if flank:
            t = flank[0]
            return Funcotation(hugo_symbol=t.gene_name, classification="FIVE_PRIME_FLANK",
                               variant_type=vt, transcript_id=t.transcript_id,
                               strand=t.strand)
        return Funcotation(variant_type=vt)

    candidates = [(_transcript_rank(t), t) for t in overlapping]
    candidates.sort(key=lambda x: x[0])
    results = [(_classify_in_transcript(t, pos1, ref, alt, vt), rank, t)
               for rank, t in candidates]
    # best transcript: rank first, then severity of classification
    results.sort(key=lambda x: (x[1], -_severity(x[0].classification)))
    return results[0][0]


def _transcript_rank(t: Transcript):
    rank = 3
    if any(tag.startswith("appris_principal") for tag in t.tags):
        rank = 0
    elif "basic" in t.tags:
        rank = 1
    elif t.transcript_type == "protein_coding":
        rank = 2
    return (rank, -(t.end - t.start))


_SEVERITY = {"NONSENSE": 10, "NONSTOP": 10, "FRAME_SHIFT_INS": 9, "FRAME_SHIFT_DEL": 9,
             "START_CODON_SNP": 9, "START_CODON_INS": 9, "START_CODON_DEL": 9,
             "SPLICE_SITE": 8, "MISSENSE": 7, "IN_FRAME_INS": 6, "IN_FRAME_DEL": 6,
             "SILENT": 5, "FIVE_PRIME_UTR": 4, "THREE_PRIME_UTR": 4, "INTRON": 3,
             "FIVE_PRIME_FLANK": 2, "RNA": 2, "LINCRNA": 2, "IGR": 0}


def _severity(c):
    return _SEVERITY.get(c, 1)


def _near_splice(t: Transcript, pos1: int) -> bool:
    exons = sorted(t.exons)
    for i, (s, e) in enumerate(exons):
        if i > 0 and abs(pos1 - s) <= SPLICE_SITE_WINDOW:
            return True
        if i < len(exons) - 1 and abs(pos1 - e) <= SPLICE_SITE_WINDOW:
            return True
    return False


def _classify_in_transcript(t: Transcript, pos1: int, ref: str, alt: str, vt) -> Funcotation:
    out = Funcotation(hugo_symbol=t.gene_name, variant_type=vt,
                      transcript_id=t.transcript_id, strand=t.strand)
    if t.transcript_type and t.transcript_type != "protein_coding":
        out.classification = "RNA" if t.transcript_type != "lincRNA" else "LINCRNA"
        return out

    tpos = t.genomic_to_transcript(pos1)
    splice = _near_splice(t, pos1) or (vt in ("INS", "DEL") and any(
        _near_splice(t, p) for p in range(pos1, pos1 + len(ref) + 1)))
    if tpos is None:
        out.classification = "SPLICE_SITE" if splice else "INTRON"
        if splice:
            out.secondary = "INTRON"
        return out

    exon_no = t.exon_number(pos1)
    if exon_no is not None:
        out.exon = str(exon_no)

    cds_range = t.cds_range
    if cds_range is None and t.cds:
        # derive transcript-coordinate CDS range from genomic CDS features
        span = t.cds_span
        a = t.genomic_to_transcript(span[0])
        b = t.genomic_to_transcript(span[1])
        if a is not None and b is not None:
            cds_range = (min(a, b), max(a, b))
    if cds_range is None:
        out.classification = "SPLICE_SITE" if splice else "RNA"
        return out

    cds_start, cds_end = cds_range
    if tpos < cds_start:
        utr5 = t.strand == "+" or True  # tpos is in transcript coords: < CDS = 5' UTR
        out.classification = "SPLICE_SITE" if splice else "FIVE_PRIME_UTR"
        return out
    if tpos > cds_end:
        out.classification = "SPLICE_SITE" if splice else "THREE_PRIME_UTR"
        return out

    # coding
    cds_pos = tpos - cds_start + 1  # 1-based within CDS
    if vt in ("INS", "DEL"):
        delta = abs(len(alt) - len(ref))
        if delta % 3:
            out.classification = "FRAME_SHIFT_INS" if vt == "INS" else "FRAME_SHIFT_DEL"
        else:
            out.classification = "IN_FRAME_INS" if vt == "INS" else "IN_FRAME_DEL"
        out.cdna_change = f"c.{cds_pos}{'ins' if vt == 'INS' else 'del'}"
        if splice:
            out.secondary = out.classification
            out.classification = "SPLICE_SITE"
        return out

    if not t.sequence:
        out.classification = "SPLICE_SITE" if splice else "MISSENSE"
        return out

    # SNP/MNP protein change from the transcript sequence
    t_ref = ref if t.strand == "+" else revcomp(ref)
    t_alt = alt if t.strand == "+" else revcomp(alt)
    n = len(t_ref)
    t_start = tpos if t.strand == "+" else tpos - n + 1

    codon_index = (t_start - cds_start) // 3  # 0-based codon
    codon_offset = (t_start - cds_start) % 3
    c0 = cds_start + codon_index * 3 - 1  # 0-based codon start in transcript
    n_codons = (codon_offset + n + 2) // 3
    ref_codons = t.sequence[c0: c0 + 3 * n_codons].upper()
    if len(ref_codons) < 3 * n_codons:
        out.classification = "SPLICE_SITE" if splice else "NONSTOP"
        return out
    alt_codons = (ref_codons[:codon_offset] + t_alt.upper()
                  + ref_codons[codon_offset + n:])
    ref_aa = "".join(CODON_TABLE.get(ref_codons[i:i + 3], "X")
                     for i in range(0, len(ref_codons), 3))
    alt_aa = "".join(CODON_TABLE.get(alt_codons[i:i + 3], "X")
                     for i in range(0, len(alt_codons), 3))
    aa_pos = codon_index + 1

    def _case_marked(codons):
        # oncotator convention: changed positions uppercase, context lowercase
        out_chars = []
        for i, ch in enumerate(codons):
            changed = codon_offset <= i < codon_offset + n
            out_chars.append(ch.upper() if changed else ch.lower())
        return "".join(out_chars)

    out.cdna_change = f"c.{cds_pos}{t_ref.upper()}>{t_alt.upper()}"
    out.codon_change = (f"c.({codon_index * 3 + 1}-{codon_index * 3 + 3 * n_codons})"
                        f"{_case_marked(ref_codons)}>{_case_marked(alt_codons)}")
    out.protein_change = f"p.{ref_aa}{aa_pos}{alt_aa}"

    if aa_pos == 1 and ref_aa != alt_aa:
        out.classification = "START_CODON_SNP"
    elif ref_aa == alt_aa:
        out.classification = "SILENT"
    elif "*" in alt_aa and "*" not in ref_aa:
        out.classification = "NONSENSE"
    elif "*" in ref_aa and "*" not in alt_aa:
        out.classification = "NONSTOP"
    else:
        out.classification = "MISSENSE"
    if splice:
        out.secondary = out.classification
        out.classification = "SPLICE_SITE"
    return out
