"""apply_backbone: unalignIslands-style interval rewriting
(Backbone.cpp:672-824 + mergePairwiseHomologyPredictions, :465).

End-to-end: align a pair with a heavily diverged (non-homologous)
middle, detect + APPLY the backbone, and verify the rewritten intervals
(1) no longer share columns between island characters and other
genomes, (2) conserve every genome's character content, (3) round-trip
through XMFA, with bbseq/bbcols consistent.
"""

import io

import pytest
import numpy as np

from libmems_tpu.aligner import AlignerConfig, align
from libmems_tpu.backbone import (apply_backbone, detect_backbone,
                                  write_backbone_columns,
                                  write_backbone_seq_coordinates,
                                  read_backbone_seq_coordinates)
from libmems_tpu.interval import (GAP, IntervalList, read_xmfa,
                                  write_xmfa)
from libmems_tpu.sequence import Genome

ALPHA = np.array(list("ACGT"))


def _seq(rng, n):
    return "".join(ALPHA[rng.integers(0, 4, n)])


def _mutate(rng, s, rate):
    a = np.frombuffer(s.encode(), dtype=np.uint8).copy()
    idx = rng.random(len(a)) < rate
    a[idx] = np.frombuffer("".join(
        ALPHA[rng.integers(0, 4, int(idx.sum()))]).encode(), np.uint8)
    return a.tobytes().decode()


def _pair_with_unrelated_middle(rng, flank=3000, mid=1200):
    """Flanks ~1% diverged; middles are INDEPENDENT random sequence
    (non-homologous) of equal length — the DP aligner will pack them
    into shared columns, the HMM must unalign them."""
    f1, f2 = _seq(rng, flank), _seq(rng, flank)
    a = f1 + _seq(rng, mid) + f2
    b = _mutate(rng, f1, 0.01) + _seq(rng, mid) + _mutate(rng, f2, 0.01)
    return a, b


def _char_counts(ivs, G):
    out = np.zeros(G, dtype=np.int64)
    for iv in ivs.intervals:
        for blk in iv.blocks:
            out += blk.lengths
    return out


def _shared_island_columns(ivs, genomes, mid_lo, mid_hi):
    """Columns where genome-0 middle chars co-occupy a column with
    genome-1 chars."""
    shared = 0
    for iv in ivs.intervals:
        rows = iv.render(genomes)
        nongap = rows != GAP
        # per column, genome-0 sequence position
        if int(iv.left_ends()[0]) == 0:
            continue
        s0 = None
        for blk in iv.blocks:
            pass
        starts = iv.starts()
        if starts[0] == 0:
            continue
        pos = np.zeros(rows.shape[1], dtype=np.int64)
        if starts[0] > 0:
            pos[nongap[0]] = starts[0] + np.arange(int(nongap[0].sum()))
        else:
            L = int(nongap[0].sum())
            pos[nongap[0]] = abs(starts[0]) + L - 1 \
                - np.arange(L)
        mid_cols = nongap[0] & (pos >= mid_lo) & (pos <= mid_hi)
        shared += int((mid_cols & nongap[1]).sum())
    return shared


@pytest.mark.slow
def test_apply_backbone_unaligns_islands_and_roundtrips():
    rng = np.random.default_rng(3)
    flank, mid = 3000, 1200
    a, b = _pair_with_unrelated_middle(rng, flank, mid)
    genomes = [Genome.from_string(a), Genome.from_string(b)]
    ivs, _ = align(genomes, AlignerConfig(gapped_alignment=True))

    mid_lo, mid_hi = flank + 1, flank + mid
    before = _shared_island_columns(ivs, genomes, mid_lo, mid_hi)
    assert before > 100, before  # DP really did pack some together

    new_ivs, segments = apply_backbone(ivs)

    # 1. island characters no longer share columns
    after = _shared_island_columns(new_ivs, genomes, mid_lo, mid_hi)
    assert after < max(20, before * 0.2), (before, after)

    # 2. character conservation
    assert np.array_equal(_char_counts(ivs, 2), _char_counts(new_ivs, 2))

    # 3. XMFA round-trip
    buf = io.StringIO()
    write_xmfa(buf, new_ivs)
    buf.seek(0)
    rt = read_xmfa(buf)
    n_rt = len(rt) if isinstance(rt, list) else len(rt.intervals)
    assert n_rt == len(new_ivs.intervals)

    # 4. backbone files consistent with the rewritten intervals
    assert segments, "no backbone found"
    colbuf = io.StringIO()
    write_backbone_columns(colbuf, segments)
    seqbuf = io.StringIO()
    write_backbone_seq_coordinates(seqbuf, segments, 2)
    seqbuf.seek(0)
    ranges = read_backbone_seq_coordinates(seqbuf)
    assert ranges.shape[0] == len(segments)
    for seg, rng_row in zip(segments, ranges):
        assert len(seg.genomes) >= 2
        iv = new_ivs.intervals[seg.interval]
        assert 0 <= seg.left_col <= seg.right_col
        for g in seg.genomes:
            l, r = abs(int(rng_row[g, 0])), abs(int(rng_row[g, 1]))
            lo, hi = min(l, r), max(l, r)
            assert 1 <= lo <= hi <= len(genomes[g])
        # backbone chars must fall inside homologous (multi-genome) cols
        rows = iv.render(genomes)
        sub = rows[:, seg.left_col:seg.right_col + 1]
        nong = sub != GAP
        assert (nong.sum(axis=0) >= 2).any()


def test_detect_and_apply_agree_on_segment_content():
    rng = np.random.default_rng(9)
    a, b = _pair_with_unrelated_middle(rng, 2500, 800)
    genomes = [Genome.from_string(a), Genome.from_string(b)]
    ivs, _ = align(genomes, AlignerConfig(gapped_alignment=True))
    det = detect_backbone(ivs)
    _, app = apply_backbone(ivs)
    # same total backbone char mass per genome either way
    def mass(segs):
        tot = np.zeros(2, dtype=np.int64)
        for s in segs:
            for g in s.genomes:
                l, r = abs(int(s.seq_ranges[g, 0])), abs(int(s.seq_ranges[g, 1]))
                tot[g] += abs(r - l) + 1
        return tot
    assert np.allclose(mass(det), mass(app), rtol=0.05, atol=60)
