"""Progressive aligner: CGA coordinate algebra, anchor projection,
zip merge, end-to-end multi-genome alignment (reference:
libMems/ProgressiveAligner.cpp, CompactGappedAlignment.h,
SeedOccurrenceList.h)."""

import numpy as np
import pytest

import libmems_tpu as lm
from libmems_tpu.anchorscore import (pairwise_anchor_scores,
                                     seed_occurrence_list)
from libmems_tpu.cga import CompactAlignment
from libmems_tpu.match import MatchArray
from libmems_tpu.progressive import (ProgressiveConfig, _zip_anchor,
                                     progressive_align)
from libmems_tpu.sequence import revcomp_ascii
from libmems_tpu.sml import SortedMerList
from libmems_tpu import seeds as seedlib

pytestmark = pytest.mark.slow  # multi-minute integration module

rng = np.random.default_rng(0)


def to_str(c):
    return "".join("ACGT"[x] for x in c)


def mutate(r, s, rate):
    out = s.copy()
    idx = r.random(len(s)) < rate
    out[idx] = r.integers(0, 4, size=int(idx.sum()))
    return out


# -- CompactAlignment -------------------------------------------------------

def test_cga_coordinate_roundtrip_forward():
    rows = np.array([list(b"AC-GT-A"), list(b"ACCG--A")], dtype=np.uint8)
    cga = CompactAlignment.from_rows(rows, np.array([10, 5]))
    assert cga.lengths().tolist() == [5, 5]
    assert cga.left_ends().tolist() == [10, 5]
    assert cga.right_ends().tolist() == [14, 9]
    # genome positions 10..14 map to columns 0,1,3,4,6
    cols = cga.genome_pos_to_column(0, np.arange(10, 15))
    assert cols.tolist() == [0, 1, 3, 4, 6]
    back = cga.column_to_genome_pos(0, cols)
    assert back.tolist() == list(range(10, 15))


def test_cga_reverse_row():
    # reverse row: start -10 means content = revcomp of [10, 10+L)
    bits = np.array([[True, True, False, True]])
    cga = CompactAlignment(starts=np.array([-10]), bits=bits)
    assert cga.lengths().tolist() == [3]
    # reading order right-to-left on forward strand: first char is
    # forward position 12, then 11, then 10
    cols = cga.genome_pos_to_column(0, np.array([12, 11, 10]))
    assert cols.tolist() == [0, 1, 3]


def test_cga_slice_columns_starts():
    rows = np.array([list(b"ACGT-ACG")], dtype=np.uint8)
    cga = CompactAlignment.from_rows(rows, np.array([100]))
    s = cga.slice_columns(2, 7)   # columns 2..6: "GT-AC"... G@102
    assert s.left_ends().tolist() == [102]
    assert s.lengths().tolist() == [4]
    # reverse version
    cgar = CompactAlignment(starts=np.array([-100]), bits=cga.bits)
    sr = cgar.slice_columns(2, 7)
    # total length 7; slice consumes chars 2..5 in reading order ->
    # forward range: right = (100+7-1) - 2 = 104, left = 104-4+1 = 101
    assert sr.starts.tolist() == [-101]


def test_cga_render_inverse():
    g = lm.Genome.from_string("AACCGGTT", name="x")
    cga = CompactAlignment(starts=np.array([-3]),
                           bits=np.ones((1, 4), dtype=bool))
    out = cga.render([g]).tobytes().decode()
    # forward [3..6] = CCGG -> revcomp = CCGG
    assert out == "CCGG"


def test_zip_anchor_exact():
    # side1: rep row 0 with a gap column; side2: rep row 0 with its own
    b1 = np.array([[True, False, True, True],
                   [True, True, True, False]])
    b2 = np.array([[False, True, True, True],
                   [True, True, False, True]])
    s1 = CompactAlignment(starts=np.array([1, 1]), bits=b1)
    s2 = CompactAlignment(starts=np.array([1, 1]), bits=b2)
    m = _zip_anchor(s1, s2, 0, 0)
    # merged: side1 char cols pair with side2 char cols in order
    assert m.seq_count == 4
    # char count preserved
    assert m.lengths().tolist() == [3, 3, 3, 3]
    # total columns = C1 + C2 - L = 4 + 4 - 3 = 5
    assert m.n_columns == 5
    # paired columns: rep rows non-gap together
    both = m.bits[0] & m.bits[2]
    assert both.sum() == 3


# -- seed occurrence --------------------------------------------------------

def test_seed_occurrence_repeats():
    seed = seedlib.get_seed(5, 0)
    # a sequence with an exact internal repeat
    unit = rng.integers(0, 4, size=40).astype(np.uint8)
    s = np.concatenate([unit, unit, rng.integers(0, 4, size=40)]).astype(np.uint8)
    sml = SortedMerList.create(s, seed)
    sol = seed_occurrence_list(sml)
    assert sol.shape == (len(s),)
    assert (sol >= 1).all()
    # positions inside the duplicated prefix should have higher
    # frequency than the unique tail
    assert sol[5:30].mean() > sol[90:110].mean()


def test_anchor_score_scaled_by_uniqueness():
    seed = seedlib.get_seed(5, 0)
    a = rng.integers(0, 4, size=200).astype(np.uint8)
    b = a.copy()
    smls = [SortedMerList.create(x, seed) for x in (a, b)]
    sols = [seed_occurrence_list(s) for s in smls]
    m = MatchArray(np.array([[1, 1]], dtype=np.int64),
                   np.array([200], dtype=np.int64))
    sc = pairwise_anchor_scores(m, 0, 1, [a, b], sols)
    assert sc[0] > 0
    # doubling repeats reduces per-column score
    a2 = np.concatenate([a, a])
    b2 = a2.copy()
    smls2 = [SortedMerList.create(x, seed) for x in (a2, b2)]
    sols2 = [seed_occurrence_list(s) for s in smls2]
    m2 = MatchArray(np.array([[1, 1]], dtype=np.int64),
                    np.array([200], dtype=np.int64))
    sc2 = pairwise_anchor_scores(m2, 0, 1, [a2, b2], sols2)
    assert sc2[0] < sc[0]


# -- end to end -------------------------------------------------------------

def _coverage_exact(ivs, genomes):
    for g, genome in enumerate(genomes):
        cov = np.zeros(len(genome) + 1, dtype=int)
        for iv in ivs.intervals:
            le, re = int(iv.left_ends()[g]), int(iv.right_ends()[g])
            if le:
                cov[le:re + 1] += 1
        if not (cov[1:] == 1).all():
            return False
    return True


def _content_exact(ivs, genomes):
    for iv in ivs.intervals:
        rows = iv.render(ivs.genomes)
        st, lens = iv.starts(), iv.lengths()
        for g in range(len(genomes)):
            if st[g] == 0:
                continue
            content = rows[g].tobytes().decode().replace("-", "")
            le = abs(int(st[g]))
            src = genomes[g].ascii[le - 1: le - 1 + int(lens[g])]
            if st[g] < 0:
                src = revcomp_ascii(src)
            if content != src.tobytes().decode():
                return False
    return True


@pytest.fixture(scope="module")
def trio():
    r = np.random.default_rng(42)
    L = 12000
    a = r.integers(0, 4, size=L).astype(np.uint8)
    b = mutate(r, a, 0.02)
    b = np.concatenate([b[:3000], b[3006:]])
    c = mutate(r, a, 0.03)
    inv = (3 - c[5000:8000])[::-1]
    c = np.concatenate([c[:5000], inv, c[8000:]])
    return [lm.Genome.from_string(to_str(x), name=n)
            for x, n in [(a, "A"), (b, "B"), (c, "C")]]


def test_progressive_three_genomes(trio):
    ivs, tree = progressive_align(trio, ProgressiveConfig())
    assert _coverage_exact(ivs, trio)
    assert _content_exact(ivs, trio)
    # inversion must appear as a negative-start interval
    assert any((iv.starts() < 0).any() and (iv.starts() != 0).sum() > 1
               for iv in ivs.intervals)
    # big collinear interval should align all three with high identity
    big = max(ivs.intervals, key=lambda iv: iv.alignment_length)
    rows = big.render(ivs.genomes)
    nz = rows != ord("-")
    ident = ((rows[0] == rows[1]) & nz[0] & nz[1]).sum() / nz[1].sum()
    assert ident > 0.9


def test_progressive_five_genomes_coverage():
    r = np.random.default_rng(3)
    L = 8000
    root = r.integers(0, 4, size=L).astype(np.uint8)
    gs = []
    for i in range(5):
        g = mutate(r, root, 0.01 + 0.01 * i)
        p = int(r.integers(2000, 6000))
        g = np.concatenate([g[:p], g[p + int(r.integers(1, 20)):]])
        gs.append(lm.Genome.from_string(to_str(g), name=f"g{i}"))
    # refine=False: the refined final-row path is covered by
    # test_progressive_three_genomes (default config) and the quality
    # gate; on the CPU mesh refine costs minutes of DP per test
    ivs, tree = progressive_align(gs, ProgressiveConfig(refine=False))
    assert _coverage_exact(ivs, gs)
    assert _content_exact(ivs, gs)


def test_progressive_unrelated_genomes_no_crash():
    r = np.random.default_rng(5)
    a = r.integers(0, 4, size=3000).astype(np.uint8)
    b = r.integers(0, 4, size=3000).astype(np.uint8)
    gs = [lm.Genome.from_string(to_str(a), name="A"),
          lm.Genome.from_string(to_str(b), name="B")]
    ivs, tree = progressive_align(gs, ProgressiveConfig())
    assert _coverage_exact(ivs, gs)


def test_progressive_validate_and_forest(trio):
    """cfg.validate runs validate_node_alignment after every merge
    (validateSuperIntervals analog); the guide tree carries the
    ancestral forest (.alignment per node) and leaf->node coordinate
    translation round-trips."""
    from libmems_tpu.progressive import translate_leaf_to_node
    ivs, tree = progressive_align(
        trio, ProgressiveConfig(validate=True, refine=False))
    # every node of the tree carries its NodeAlignment
    for node in tree.postorder():
        assert hasattr(node, "alignment")
    root_aln = tree.alignment
    assert sorted(root_aln.leaf_ids) == [0, 1, 2]
    # translate a mid-genome range of leaf 0 to root columns and verify
    # the column range really contains those bases
    spans = translate_leaf_to_node(tree, 0, 4000, 4200)
    assert spans, "range must be covered at the root"
    covered = 0
    for bi, c_lo, c_hi, leaf_lo in spans:
        blk = root_aln.blocks[bi]
        row = root_aln.row_of(0)
        assert 0 <= c_lo <= c_hi < blk.n_columns
        covered += int(blk.bits[row, c_lo:c_hi + 1].sum())
    assert covered == 201


def test_validate_node_alignment_rejects_corruption(trio):
    from libmems_tpu.validate import (ValidationError,
                                      validate_node_alignment)
    # refine only reshapes final interval rows, never node alignments
    ivs, tree = progressive_align(trio, ProgressiveConfig(refine=False))
    aln = tree.alignment
    import copy
    bad = copy.deepcopy(aln)
    # punch a hole in leaf 0's coverage: shift one block's start
    for blk in bad.blocks:
        row = bad.row_of(0)
        if blk.starts[row] > 1:
            blk.starts[row] += 3
            break
    with pytest.raises(ValidationError):
        validate_node_alignment(bad, trio)


def test_progressive_checkpoint_resume(trio, tmp_path):
    """A rerun with checkpoint_dir resumes from persisted stages and
    reproduces the alignment; a changed input invalidates the state."""
    from libmems_tpu.progressive import _ProgressiveCheckpoint
    ck = str(tmp_path / "ck")
    cfg = ProgressiveConfig(checkpoint_dir=ck, refine=False)
    ivs1, tree1 = progressive_align(trio, cfg)
    import os
    files = os.listdir(ck)
    assert "pairwise_matches.npz" in files
    assert any(f.startswith("node_") for f in files)

    # resume: node merges must come from the checkpoint (align_nodes
    # must not run again)
    import libmems_tpu.progressive as prog
    orig = prog.align_nodes
    calls = {"n": 0}

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)
    prog.align_nodes = spy
    try:
        ivs2, tree2 = progressive_align(trio, cfg)
    finally:
        prog.align_nodes = orig
    assert calls["n"] == 0
    assert len(ivs1.intervals) == len(ivs2.intervals)
    for a, b in zip(ivs1.intervals, ivs2.intervals):
        assert a.render(ivs1.genomes).tobytes() == \
            b.render(ivs2.genomes).tobytes()

    # different genomes -> stale key -> checkpoints dropped
    r = np.random.default_rng(9)
    other = [lm.Genome.from_string(to_str(r.integers(0, 4, 4000)
                                          .astype(np.uint8)), name="X"),
             trio[0]]
    _ = _ProgressiveCheckpoint(ck, other, 12345)
    assert not any(f.startswith("node_") for f in os.listdir(ck))


def test_seed_occurrence_device_matches_numpy():
    from libmems_tpu.sml import SortedMerList
    r = np.random.default_rng(3)
    codes = r.integers(0, 4, 4000).astype(np.uint8)
    codes[900:1000] = codes[:100]   # repeat
    sml = SortedMerList.create(codes, seedlib.get_seed(9, 0))
    sol = seed_occurrence_list(sml)
    # numpy oracle of SeedOccurrenceList::construct + smoothing
    total_len, seed_len = sml.length, sml.seed_length
    count = np.ones(total_len, dtype=np.float64)
    skeys = np.asarray(sml.sorted_keys) >> 1
    spos = np.asarray(sml.sorted_positions)
    change = np.concatenate([[True], skeys[1:] != skeys[:-1]])
    run_id = np.cumsum(change) - 1
    count[spos] = np.bincount(run_id)[run_id]
    padded = np.concatenate([np.ones(seed_len - 1), count])
    csum = np.concatenate([[0.0], np.cumsum(padded)])
    sm = (csum[seed_len:] - csum[:-seed_len]) / seed_len
    count[:-1] = sm[:-1]
    want = np.maximum(count, 1.0).astype(np.float32)
    assert np.abs(sol - want).max() < 1e-3
