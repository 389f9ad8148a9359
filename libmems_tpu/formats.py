"""Alignment output formats and legacy analyses.

Covers the reference's remaining serialization surface:

* multi-format MSA writers/readers — gnAlignedSequences
  (libMems/gnAlignedSequences.{h,cpp}: Phylip, ClustalW, MSF, Nexus,
  Mega, FastA);
* permutation output — Aligner::WritePermutation (Aligner.cpp:1886) and
  WritePermutationCoordinates (Aligner.cpp:1918);
* simple (gap-run) island + backbone detection and their text formats —
  simpleFindIslands / simpleFindBackbone / outputBackbone
  (libMems/Islands.cpp:25-230);
* a versioned interval-list checkpoint format replacing the reference's
  proprietary GenericIntervalList::WriteList (IntervalList.h:131-303) —
  same role (lossless alignment persistence), JSON-lines layout.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from libmems_tpu.interval import Block, Interval, IntervalList
from libmems_tpu.scoring import GAP
from libmems_tpu.sequence import Genome


def _open(path_or_fh, mode="w"):
    own = isinstance(path_or_fh, (str, os.PathLike))
    return (open(path_or_fh, mode) if own else path_or_fh), own


# --------------------------------------------------------------------------
# multi-format MSA writers (gnAlignedSequences.h:69-161)
# --------------------------------------------------------------------------

def _rows_names(rows: np.ndarray, names: list[str] | None):
    G = rows.shape[0]
    if names is None:
        names = [f"seq{i + 1}" for i in range(G)]
    return [n.replace(" ", "_") for n in names]


def write_phylip(path_or_fh, rows: np.ndarray,
                 names: list[str] | None = None, width: int = 60):
    """Interleaved Phylip (gnAlignedSequences::outputPhylip)."""
    fh, own = _open(path_or_fh)
    try:
        G, C = rows.shape
        names = _rows_names(rows, names)
        fh.write(f" {G} {C}\n")
        for base in range(0, C, width):
            for g in range(G):
                label = f"{names[g][:10]:<10}" if base == 0 else " " * 10
                fh.write(label +
                         rows[g, base:base + width].tobytes().decode() + "\n")
            fh.write("\n")
    finally:
        if own:
            fh.close()


def read_phylip(path_or_fh) -> tuple[np.ndarray, list[str]]:
    fh, own = _open(path_or_fh, "r")
    try:
        G, C = (int(x) for x in fh.readline().split()[:2])
        names = [""] * G
        chunks: list[list[str]] = [[] for _ in range(G)]
        g = 0
        first_pass = True
        for line in fh:
            if not line.strip():
                continue
            if first_pass and not names[g]:
                names[g] = line[:10].strip()
                chunks[g].append(line[10:].strip().replace(" ", ""))
            else:
                chunks[g].append(line[10:].strip().replace(" ", "")
                                 if line[:10].strip() == "" or not first_pass
                                 else line[10:].strip())
            g += 1
            if g == G:
                g = 0
                first_pass = False
        rows = np.stack([np.frombuffer("".join(c).encode()[:C], np.uint8)
                         for c in chunks])
        return rows, names
    finally:
        if own:
            fh.close()


def write_clustalw(path_or_fh, rows: np.ndarray,
                   names: list[str] | None = None, width: int = 60):
    """ClustalW .aln (gnAlignedSequences::outputClustalW)."""
    fh, own = _open(path_or_fh)
    try:
        G, C = rows.shape
        names = _rows_names(rows, names)
        pad = max(len(n) for n in names) + 6
        fh.write("CLUSTAL W (1.81) multiple sequence alignment\n\n\n")
        for base in range(0, C, width):
            for g in range(G):
                fh.write(f"{names[g]:<{pad}}" +
                         rows[g, base:base + width].tobytes().decode() + "\n")
            # conservation line: '*' where all rows identical non-gap
            seg = rows[:, base:base + width]
            star = (seg == seg[0]).all(axis=0) & (seg[0] != GAP)
            fh.write(" " * pad +
                     "".join("*" if s else " " for s in star) + "\n\n")
    finally:
        if own:
            fh.close()


def read_clustalw(path_or_fh) -> tuple[np.ndarray, list[str]]:
    fh, own = _open(path_or_fh, "r")
    try:
        fh.readline()
        names: list[str] = []
        chunks: dict[str, list[str]] = {}
        for line in fh:
            s = line.rstrip("\n")
            if not s.strip() or s.startswith("CLUSTAL"):
                continue
            if s[0] == " ":
                continue  # conservation line
            parts = s.split()
            if len(parts) < 2:
                continue
            name, seq = parts[0], parts[1]
            if name not in chunks:
                names.append(name)
                chunks[name] = []
            chunks[name].append(seq)
        rows = np.stack([np.frombuffer("".join(chunks[n]).encode(), np.uint8)
                         for n in names])
        return rows, names
    finally:
        if own:
            fh.close()


def write_msf(path_or_fh, rows: np.ndarray,
              names: list[str] | None = None, width: int = 50):
    """GCG MSF (gnAlignedSequences::outputMSF)."""
    fh, own = _open(path_or_fh)
    try:
        G, C = rows.shape
        names = _rows_names(rows, names)
        fh.write(f"PileUp\n\n   MSF: {C}  Type: N  Check: 0 ..\n\n")
        for g in range(G):
            fh.write(f" Name: {names[g]}  Len: {C}  Check: 0  Weight: 1.0\n")
        fh.write("\n//\n\n")
        for base in range(0, C, width):
            for g in range(G):
                seg = rows[g, base:base + width].tobytes().decode()
                seg = seg.replace("-", ".")
                grouped = " ".join(seg[i:i + 10]
                                   for i in range(0, len(seg), 10))
                fh.write(f"{names[g]:<15} {grouped}\n")
            fh.write("\n")
    finally:
        if own:
            fh.close()


def write_nexus(path_or_fh, rows: np.ndarray,
                names: list[str] | None = None):
    """NEXUS data block (gnAlignedSequences::outputNexus)."""
    fh, own = _open(path_or_fh)
    try:
        G, C = rows.shape
        names = _rows_names(rows, names)
        fh.write("#NEXUS\nbegin data;\n")
        fh.write(f"dimensions ntax={G} nchar={C};\n")
        fh.write("format datatype=dna interleave=no gap=-;\nmatrix\n")
        for g in range(G):
            fh.write(f"{names[g]}  {rows[g].tobytes().decode()}\n")
        fh.write(";\nend;\n")
    finally:
        if own:
            fh.close()


def write_mega(path_or_fh, rows: np.ndarray,
               names: list[str] | None = None, width: int = 60):
    """MEGA format (gnAlignedSequences::outputMega)."""
    fh, own = _open(path_or_fh)
    try:
        G, C = rows.shape
        names = _rows_names(rows, names)
        fh.write("#mega\nTITLE: libmems_tpu alignment\n\n")
        for g in range(G):
            fh.write(f"#{names[g]}\n")
            row = rows[g].tobytes().decode()
            for i in range(0, C, width):
                fh.write(row[i:i + width] + "\n")
            fh.write("\n")
    finally:
        if own:
            fh.close()


def write_fasta_msa(path_or_fh, rows: np.ndarray,
                    names: list[str] | None = None, width: int = 80):
    fh, own = _open(path_or_fh)
    try:
        names = _rows_names(rows, names)
        for g in range(rows.shape[0]):
            fh.write(f">{names[g]}\n")
            row = rows[g].tobytes().decode()
            for i in range(0, len(row), width):
                fh.write(row[i:i + width] + "\n")
    finally:
        if own:
            fh.close()


def read_msf(path_or_fh) -> tuple[np.ndarray, list[str]]:
    """GCG MSF reader (gnAlignedSequences::readMSF semantics: names from
    the Name: header lines, sequence blocks after '//', '.' = gap)."""
    fh, own = _open(path_or_fh, "r")
    try:
        names: list[str] = []
        chunks: dict[str, list[str]] = {}
        in_seqs = False
        for line in fh:
            s = line.strip()
            if not in_seqs:
                if s.startswith("Name:"):
                    name = s.split()[1]
                    names.append(name)
                    chunks[name] = []
                elif s.startswith("//"):
                    in_seqs = True
                continue
            if not s:
                continue
            parts = s.split()
            if parts[0] in chunks:
                chunks[parts[0]].append("".join(parts[1:]).replace(".", "-"))
        rows = np.stack([np.frombuffer("".join(chunks[n]).encode(), np.uint8)
                         for n in names])
        return rows, names
    finally:
        if own:
            fh.close()


def read_nexus(path_or_fh) -> tuple[np.ndarray, list[str]]:
    """NEXUS data-block reader (non-interleaved matrix, as written by
    write_nexus / gnAlignedSequences::outputNexus)."""
    fh, own = _open(path_or_fh, "r")
    try:
        names: list[str] = []
        chunks: dict[str, list[str]] = {}
        in_matrix = False
        for line in fh:
            s = line.strip()
            low = s.lower()
            if low.startswith("matrix"):
                in_matrix = True
                continue
            if not in_matrix:
                continue
            if s.startswith(";") or low.startswith("end;"):
                break
            if not s:
                continue
            parts = s.split()
            if len(parts) < 2:
                continue
            name = parts[0]
            if name not in chunks:
                names.append(name)
                chunks[name] = []
            chunks[name].append("".join(parts[1:]).rstrip(";"))
        rows = np.stack([np.frombuffer("".join(chunks[n]).encode(), np.uint8)
                         for n in names])
        return rows, names
    finally:
        if own:
            fh.close()


def read_mega(path_or_fh) -> tuple[np.ndarray, list[str]]:
    """MEGA reader (#name headers, as written by write_mega /
    gnAlignedSequences::outputMega)."""
    fh, own = _open(path_or_fh, "r")
    try:
        names: list[str] = []
        chunks: dict[str, list[str]] = {}
        cur: str | None = None
        for line in fh:
            s = line.strip()
            if s.startswith("#"):
                tag = s[1:].strip()
                if tag.lower() == "mega" or tag.upper().startswith("TITLE"):
                    continue
                cur = tag
                if cur not in chunks:
                    names.append(cur)
                    chunks[cur] = []
                continue
            if s.upper().startswith("TITLE"):
                continue
            if cur is not None and s:
                chunks[cur].append(s)
        rows = np.stack([np.frombuffer("".join(chunks[n]).encode(), np.uint8)
                         for n in names])
        return rows, names
    finally:
        if own:
            fh.close()


def read_fasta_msa(path_or_fh) -> tuple[np.ndarray, list[str]]:
    fh, own = _open(path_or_fh, "r")
    try:
        names: list[str] = []
        chunks: list[list[str]] = []
        for line in fh:
            s = line.strip()
            if s.startswith(">"):
                names.append(s[1:].split()[0] if len(s) > 1 else "")
                chunks.append([])
            elif s and chunks:
                chunks[-1].append(s)
        rows = np.stack([np.frombuffer("".join(c).encode(), np.uint8)
                         for c in chunks])
        return rows, names
    finally:
        if own:
            fh.close()


def write_interval_xml(path_or_fh, ivs: IntervalList,
                       names: list[str] | None = None):
    """Alignment as XML (GenericIntervalList::WriteXML,
    IntervalList.h:304-350): one <Interval> element per interval with
    per-sequence <Segment start end orientation> children for each
    aligned block."""
    fh, own = _open(path_or_fh)
    try:
        G = ivs.intervals[0].seq_count if len(ivs) else \
            len(getattr(ivs, "genomes", []) or [])
        if names is None:
            if getattr(ivs, "genomes", None):
                names = [g.name or f"seq{i + 1}"
                         for i, g in enumerate(ivs.genomes)]
            else:
                names = [f"seq{i + 1}" for i in range(G)]
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        fh.write(f'<Alignment sequenceCount="{G}">\n')
        for i, name in enumerate(names):
            fh.write(f'  <Sequence id="{i}" name="{name}"/>\n')
        for iv in ivs:
            fh.write(f'  <Interval length="{iv.alignment_length}">\n')
            starts = iv.starts()
            lengths = iv.lengths()
            for g in range(iv.seq_count):
                s = int(starts[g])
                if s == 0:
                    continue
                orient = "forward" if s > 0 else "reverse"
                fh.write(f'    <Segment sequence="{g}" start="{abs(s)}" '
                         f'length="{int(lengths[g])}" '
                         f'orientation="{orient}"/>\n')
            fh.write('  </Interval>\n')
        fh.write('</Alignment>\n')
    finally:
        if own:
            fh.close()


# --------------------------------------------------------------------------
# permutations (Aligner.cpp:1886-1949)
# --------------------------------------------------------------------------

def write_permutation(path_or_fh, ivs: IntervalList):
    """Signed LCB order per genome (Aligner::WritePermutation): one line
    per genome, tab-separated signed LCB ids in genome order.  LCB id =
    interval index among multi-genome intervals."""
    fh, own = _open(path_or_fh)
    try:
        multi = [(i, iv) for i, iv in enumerate(ivs.intervals)
                 if (iv.starts() != 0).sum() >= 2]
        G = len(ivs.genomes)
        for g in range(G):
            entries = []
            for lcb_id, (_, iv) in enumerate(multi):
                st = int(iv.starts()[g])
                if st == 0:
                    continue
                entries.append((abs(st), -lcb_id if st < 0 else lcb_id,
                                st < 0))
            entries.sort()
            fh.write("\t".join(
                ("-" if neg else "") + str(abs(sid))
                for _, sid, neg in entries) + "\n")
    finally:
        if own:
            fh.close()


def write_permutation_coordinates(path_or_fh, ivs: IntervalList):
    """Per-LCB signed left/right ends per genome
    (WritePermutationCoordinates, Aligner.cpp:1918-1949)."""
    fh, own = _open(path_or_fh)
    try:
        G = len(ivs.genomes)
        fh.write("#" + "\t".join(
            f"seq{g}_leftend\tseq{g}_rightend" for g in range(G)) + "\n")
        for iv in ivs.intervals:
            if (iv.starts() != 0).sum() < 2:
                continue
            st = iv.starts()
            le = iv.left_ends()
            re = iv.right_ends()
            cols = []
            for g in range(G):
                sgn = "-" if st[g] < 0 else ""
                cols.append(f"{sgn}{le[g]}")
                cols.append(f"{sgn}{re[g]}")
            fh.write("\t".join(cols) + "\n")
    finally:
        if own:
            fh.close()


# --------------------------------------------------------------------------
# simple islands / backbone (Islands.cpp:25-230)
# --------------------------------------------------------------------------

@dataclass
class SimpleIsland:
    seqI: int
    leftI: int
    rightI: int
    seqJ: int
    leftJ: int
    rightJ: int


def simple_find_islands(ivs: IntervalList, island_size: int
                        ) -> list[SimpleIsland]:
    """Pairwise regions between identical columns whose char span
    exceeds island_size in either genome (simpleFindIslands,
    Islands.cpp:37-89)."""
    out: list[SimpleIsland] = []
    G = len(ivs.genomes)
    for iv in ivs.intervals:
        rows = iv.render(ivs.genomes)
        st = iv.starts()
        C = rows.shape[1]
        nongap = rows != GAP
        cum = np.cumsum(nongap, axis=1)
        for i in range(G):
            for j in range(i + 1, G):
                if st[i] == 0 or st[j] == 0:
                    continue
                same = (np.char.upper(rows[i].view("S1")) ==
                        np.char.upper(rows[j].view("S1"))) & nongap[j]
                anchor_cols = np.flatnonzero(same)
                lastI = lastJ = 0
                for c in anchor_cols:
                    curI, curJ = int(cum[i, c]), int(cum[j, c])
                    if curI - lastI > island_size or \
                       curJ - lastJ > island_size:
                        li = int(st[i])
                        lj = int(st[j])
                        out.append(SimpleIsland(
                            seqI=i,
                            leftI=li - lastI if li < 0 else li + lastI,
                            rightI=li - curI if li < 0 else li + curI,
                            seqJ=j,
                            leftJ=lj - lastJ if lj < 0 else lj + lastJ,
                            rightJ=lj - curJ if lj < 0 else lj + curJ))
                    lastI, lastJ = curI, curJ
    return out


def write_islands(path_or_fh, islands: list[SimpleIsland]):
    fh, own = _open(path_or_fh)
    try:
        for isl in islands:
            fh.write(f"{isl.seqI}\t{isl.leftI}\t{isl.rightI}\t"
                     f"{isl.seqJ}\t{isl.leftJ}\t{isl.rightJ}\n")
    finally:
        if own:
            fh.close()


def simple_find_backbone(ivs: IntervalList, backbone_size: int,
                         max_gap_size: int) -> list[np.ndarray]:
    """Collinear backbone: maximal column runs where every genome is
    present with no gap run longer than max_gap_size, spanning at least
    backbone_size chars in every genome (simpleFindBackbone,
    Islands.cpp:96-204).  Returns per-segment int64[G, 2] signed
    coordinates."""
    out: list[np.ndarray] = []
    G = len(ivs.genomes)
    for iv in ivs.intervals:
        st = iv.starts()
        if (st != 0).sum() < G:
            continue
        rows = iv.render(ivs.genomes)
        C = rows.shape[1]
        nongap = rows != GAP
        cum = np.cumsum(nongap, axis=1)
        # per column: does any genome sit in a gap run > max_gap_size?
        bad = np.zeros(C, dtype=bool)
        for g in range(G):
            gaps = ~nongap[g]
            edges = np.flatnonzero(np.diff(np.concatenate(
                [[0], gaps.astype(np.int8), [0]])))
            for lo, hi in zip(edges[::2], edges[1::2]):
                if hi - lo > max_gap_size:
                    bad[lo:hi] = True
        good = ~bad
        edges = np.flatnonzero(np.diff(np.concatenate(
            [[0], good.astype(np.int8), [0]])))
        for lo, hi in zip(edges[::2], edges[1::2]):
            hi -= 1
            spans = cum[:, hi] - (cum[:, lo] - nongap[:, lo])
            if (spans < backbone_size).any():
                continue
            seg = np.zeros((G, 2), dtype=np.int64)
            for g in range(G):
                before = int(cum[g, lo] - nongap[g, lo])
                inside = int(spans[g])
                s = int(st[g])
                if s > 0:
                    seg[g] = (s + before, s + before + inside - 1)
                else:
                    seg[g] = (s - before, s - before - inside + 1)
            out.append(seg)
    return out


def write_simple_backbone(path_or_fh, segments: list[np.ndarray]):
    """outputBackbone (Islands.cpp:205-218): per segment, per genome
    start/end pairs, tab-separated."""
    fh, own = _open(path_or_fh)
    try:
        for seg in segments:
            cols = []
            for g in range(seg.shape[0]):
                cols.append(str(int(seg[g, 0])))
                cols.append(str(int(seg[g, 1])))
            fh.write("\t".join(cols) + "\n")
    finally:
        if own:
            fh.close()


# --------------------------------------------------------------------------
# interval-list checkpoint (GenericIntervalList::WriteList role)
# --------------------------------------------------------------------------

def write_interval_list(path_or_fh, ivs: IntervalList):
    """Lossless interval persistence (JSON lines: header + one object
    per block).  Replaces the reference's proprietary interval format
    (IntervalList.h:131-303) for checkpoint/resume."""
    fh, own = _open(path_or_fh)
    try:
        fh.write(json.dumps({
            "format": "libmems_tpu-intervals-1",
            "seq_count": len(ivs.genomes),
            "seq_names": [g.name for g in ivs.genomes],
            "seq_lengths": [len(g) for g in ivs.genomes],
            "n_intervals": len(ivs.intervals)}) + "\n")
        for iv in ivs.intervals:
            for bi, b in enumerate(iv.blocks):
                rec = {
                    "iv": 1 if bi == 0 else 0,
                    "starts": [int(x) for x in b.starts],
                    "lengths": [int(x) for x in b.lengths],
                }
                if b.rows is not None:
                    rec["rows"] = [r.tobytes().decode() for r in b.rows]
                fh.write(json.dumps(rec) + "\n")
    finally:
        if own:
            fh.close()


def read_interval_list(path_or_fh, genomes: list[Genome]) -> IntervalList:
    fh, own = _open(path_or_fh, "r")
    try:
        header = json.loads(fh.readline())
        if header.get("format") != "libmems_tpu-intervals-1":
            raise ValueError("not a libmems_tpu interval list")
        intervals: list[Interval] = []
        blocks: list[Block] = []
        for line in fh:
            rec = json.loads(line)
            if rec["iv"] == 1 and blocks:
                intervals.append(Interval(blocks=blocks,
                                          seq_count=header["seq_count"]))
                blocks = []
            rows = None
            if "rows" in rec:
                rows = np.stack([np.frombuffer(r.encode(), np.uint8)
                                 for r in rec["rows"]])
            blocks.append(Block(
                starts=np.array(rec["starts"], dtype=np.int64),
                lengths=np.array(rec["lengths"], dtype=np.int64),
                rows=rows))
        if blocks:
            intervals.append(Interval(blocks=blocks,
                                      seq_count=header["seq_count"]))
        return IntervalList(intervals, genomes)
    finally:
        if own:
            fh.close()
