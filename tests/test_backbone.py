"""HomologyHMM + islands + backbone detection (reference:
libMems/HomologyHMM/*, Islands.h, Backbone.{h,cpp})."""

import io

import numpy as np
import pytest

import libmems_tpu as lm
from libmems_tpu.backbone import (compute_gc, detect_backbone,
                                  read_backbone_seq_coordinates,
                                  write_backbone_columns,
                                  write_backbone_seq_coordinates)
from libmems_tpu.islands import (HssCols, complement_hss,
                                 encode_column_states, find_big_gaps,
                                 find_hss_homology_batch)
from libmems_tpu.ops.hmm import (adapt_to_percent_identity,
                                 adapted_hoxd_params, hoxd_params,
                                 posterior_homologous, predict_homologous)

rng = np.random.default_rng(0)


def arow(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8)


# -- parameters --------------------------------------------------------------

def test_params_normalized():
    for p in (hoxd_params(), adapted_hoxd_params(0.5),
              adapted_hoxd_params(0.3)):
        assert abs(p.emit_homologous.sum() - 1.0) < 1e-9
        assert abs(p.emit_unrelated.sum() - 1.0) < 1e-9
        assert (p.emit_homologous > 0).all()
        assert (p.emit_unrelated > 0).all()


def test_adapt_to_percent_identity():
    p = adapt_to_percent_identity(hoxd_params(), 0.7)
    eh = p.emit_homologous
    gapnorm = eh[0] + eh[1]
    expect = 0.7 * (1 - eh[6] - eh[7])
    assert abs(gapnorm - expect) < 1e-9


# -- column encoding ---------------------------------------------------------

def test_encode_column_states_classes():
    s, ref = encode_column_states(arow("AACAG-A-"), arow("ATC-GG-T"))
    # columns: A/A=0, A/T=4, C/C=1, A/-=6, G/G=1, -/G=6, A/- ... wait
    # gap/gap columns removed: none here (col 6 is -/- ? rows: 'A-' vs
    # '-T' -> col6 = '-','-'? no: row1[6]='A'? recompute below.
    assert ref.tolist() == list(range(8))
    assert s[0] == 0        # A:A
    assert s[1] == 4        # A:T
    assert s[2] == 1        # C:C
    assert s[3] == 6        # A:- gap open
    assert s[4] == 1        # G:G
    assert s[5] == 6        # -:G gap open (not extend: non-adjacent run)


def test_encode_gap_run_rewrite():
    # run of 4 single-gap columns: open, extend, extend, open(tail stays
    # unless boundary) per the reference's interior-rewrite semantics
    s, _ = encode_column_states(arow("AAAAAA"), arow("A----A"))
    assert s.tolist() == [0, 6, 7, 7, 6, 0]
    # boundary case: only the first column of a start-touching run is
    # rewritten (Islands.h:152-153 rewrites s[0] alone)
    s2, _ = encode_column_states(arow("AAAA"), arow("--AA"))
    assert s2.tolist() == [7, 6, 0, 0]


def test_encode_gapgap_removed():
    s, ref = encode_column_states(arow("A--T"), arow("A--T"))
    assert s.tolist() == [0, 0]
    assert ref.tolist() == [0, 3]


# -- HMM ---------------------------------------------------------------------

def test_posterior_homologous_segments():
    # identity columns (class 0/1) = homologous; long random-ish
    # mismatch/gap stretch = unrelated
    hom = np.array([0, 1] * 150, dtype=np.uint8)
    unrel = np.array([4, 3, 6, 7, 7, 2, 4, 3] * 50, dtype=np.uint8)
    seq = np.concatenate([hom, unrel, hom])
    post = posterior_homologous([seq])[0]
    assert post[:250].mean() > 0.9
    assert post[350:650].mean() < 0.5
    assert post[-250:].mean() > 0.9


def test_predict_batched_matches_single():
    seqs = [np.array([0, 1] * 40, dtype=np.uint8),
            np.array([4, 3, 6, 7] * 30, dtype=np.uint8),
            np.array([0] * 100 + [3, 4, 6, 7, 7] * 40, dtype=np.uint8)]
    batch = predict_homologous(seqs)
    for i, s in enumerate(seqs):
        solo = predict_homologous([s])[0]
        assert (batch[i] == solo).all()


def test_hss_detection_end_to_end():
    # two sequences homologous at the flanks, unrelated middle
    r = np.random.default_rng(1)
    flank = r.integers(0, 4, size=400).astype(np.uint8)
    mid_a = r.integers(0, 4, size=300).astype(np.uint8)
    mid_b = r.integers(0, 4, size=300).astype(np.uint8)
    to_ascii = lambda c: np.frombuffer(
        "".join("ACGT"[x] for x in c).encode(), np.uint8)
    row_a = np.concatenate([to_ascii(flank), to_ascii(mid_a),
                            to_ascii(flank)])
    row_b = np.concatenate([to_ascii(flank), to_ascii(mid_b),
                            to_ascii(flank)])
    hss = find_hss_homology_batch([(row_a, row_b, 0, 1)])[0]
    assert hss, "expected homologous segments"
    covered = np.zeros(len(row_a), dtype=bool)
    for h in hss:
        covered[h.left_col:h.right_col + 1] = True
    # flanks homologous, middle not
    assert covered[:350].mean() > 0.9
    assert covered[450:650].mean() < 0.3
    assert covered[-350:].mean() > 0.9
    # islands = complement
    isl = complement_hss(hss, len(row_a))
    total = sum(h.right_col - h.left_col + 1 for h in hss) + \
        sum(i.right_col - i.left_col + 1 for i in isl)
    assert total == len(row_a)


def test_find_big_gaps():
    row_a = arow("A" * 100 + "A" * 50 + "A" * 100)
    row_b = arow("A" * 100 + "-" * 50 + "A" * 100)
    segs = find_big_gaps(row_a, row_b, 0, 1, big_gap_size=20)
    assert len(segs) == 2
    assert (segs[0].left_col, segs[0].right_col) == (0, 99)
    assert (segs[1].left_col, segs[1].right_col) == (150, 249)


# -- backbone ---------------------------------------------------------------

def _mutate(r, s, rate):
    out = s.copy()
    idx = r.random(len(s)) < rate
    out[idx] = r.integers(0, 4, size=int(idx.sum()))
    return out


def test_backbone_detection_and_files(tmp_path):
    r = np.random.default_rng(4)
    to_str = lambda c: "".join("ACGT"[x] for x in c)
    core = r.integers(0, 4, size=2000).astype(np.uint8)
    ins = r.integers(0, 4, size=600).astype(np.uint8)   # B-only island
    a = to_str(np.concatenate([core[:1000], core[1000:]]))
    b = to_str(np.concatenate([_mutate(r, core[:1000], 0.02), ins,
                               _mutate(r, core[1000:], 0.02)]))
    ga = lm.Genome.from_string(a, name="A")
    gb = lm.Genome.from_string(b, name="B")
    ivs, _ = lm.align([ga, gb], lm.AlignerConfig(gapped_alignment=True))
    segs = detect_backbone(ivs)
    assert segs
    # backbone must cover most of the shared core in genome A but not
    # claim the B-only insertion
    a_cov = np.zeros(len(ga) + 1, dtype=bool)
    b_cov = np.zeros(len(gb) + 1, dtype=bool)
    for s in segs:
        for g, cov in ((0, a_cov), (1, b_cov)):
            lo, hi = abs(int(s.seq_ranges[g, 0])), abs(int(s.seq_ranges[g, 1]))
            if lo:
                cov[min(lo, hi):max(lo, hi) + 1] = True
    assert a_cov[1:].mean() > 0.8
    assert b_cov[1050:1550].mean() < 0.3   # the insertion is an island
    # file round trips
    p = tmp_path / "out.bbseq"
    write_backbone_seq_coordinates(str(p), segs, 2)
    back = read_backbone_seq_coordinates(str(p))
    assert back.shape == (len(segs), 2, 2)
    assert (back[0] == segs[0].seq_ranges).all()
    buf = io.StringIO()
    write_backbone_columns(buf, segs)
    assert len(buf.getvalue().splitlines()) == len(segs)


def test_compute_gc():
    g = lm.Genome.from_string("GGCCAATT", name="x")
    assert abs(compute_gc([g]) - 0.5) < 1e-12


def test_big_gaps_detector_composed_with_hmm():
    """A long single-genome indel splits the HMM's input and is never
    homologous (BigGapsDetector composition, Backbone.h:88-126,
    Islands.h:363-412)."""
    import numpy as np
    from libmems_tpu.backbone import detect_backbone
    from libmems_tpu.interval import Block, Interval, IntervalList
    from libmems_tpu.sequence import Genome

    rng = np.random.default_rng(21)
    flank = rng.choice(list(b"ACGT"), size=3000).astype(np.uint8)
    flank2 = rng.choice(list(b"ACGT"), size=3000).astype(np.uint8)
    insert = rng.choice(list(b"ACGT"), size=50_000).astype(np.uint8)
    a_seq = np.concatenate([flank, insert, flank2])
    b_seq = np.concatenate([flank, flank2])
    ga = Genome("a", a_seq)
    gb = Genome("b", b_seq)
    C = len(a_seq)
    rows = np.vstack([
        a_seq,
        np.concatenate([flank, np.full(50_000, ord("-"), np.uint8),
                        flank2])])
    iv = Interval(blocks=[Block(
        starts=np.array([1, 1], np.int64),
        lengths=np.array([C, len(b_seq)], np.int64), rows=rows)],
        seq_count=2)
    segs = detect_backbone(IntervalList([iv], [ga, gb]),
                           big_gap_size=10_000)
    assert segs, "flanks must be detected as backbone"
    for s in segs:
        # no backbone segment may overlap the indel columns [3000, 53000)
        assert s.right_col < 3000 or s.left_col >= 53_000
    covered = sum(s.right_col - s.left_col + 1 for s in segs)
    assert covered >= 5000  # both flanks essentially recovered
