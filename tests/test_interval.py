"""Interval construction and XMFA serialization round-trip."""

import io

import numpy as np

from libmems_tpu.aligner import AlignerConfig, align
from libmems_tpu.interval import (IntervalList, interval_from_matches,
                                  read_xmfa, write_xmfa)
from libmems_tpu.match import MatchArray
from libmems_tpu.sequence import Genome
from libmems_tpu import seeds as seedlib

ALPHA = np.array(list("ACGT"))


def rc(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def random_seq(rng, n):
    return "".join(rng.choice(ALPHA, size=n))


def mutate(rng, s, rate):
    chars = np.array(list(s))
    idx = rng.random(len(chars)) < rate
    chars[idx] = rng.choice(ALPHA, size=idx.sum())
    return "".join(chars)


def ma(rows):
    starts = np.array([r[:-1] for r in rows], dtype=np.int64)
    lens = np.array([r[-1] for r in rows], dtype=np.int64)
    return MatchArray(starts, lens)


def test_interval_render_forward():
    a = Genome.from_string("ACGTACGTACGTACGTACGT", name="a")
    b = Genome.from_string("ACGTACGTTTTTACGTACGT", name="b")
    m = ma([(1, 1, 8), (13, 13, 8)])
    iv = interval_from_matches(m, np.array([0, 1]))
    rows = iv.render([a, b])
    texts = [r.tobytes().decode().replace("-", "") for r in rows]
    assert texts[0] == a.to_string()[0:20]
    assert texts[1] == b.to_string()[0:20]
    # anchors aligned: first 8 columns identical
    assert rows[0, :8].tobytes() == rows[1, :8].tobytes()


def test_interval_render_reverse():
    rng = np.random.default_rng(3)
    s = random_seq(rng, 30)
    a = Genome.from_string(s, name="a")
    b = Genome.from_string(rc(s), name="b")
    # whole-length reverse match
    m = ma([(1, -1, 30)])
    iv = interval_from_matches(m, np.array([0]))
    rows = iv.render([a, b])
    assert rows[0].tobytes().decode() == s
    assert rows[1].tobytes().decode() == s  # revcomp of rc(s) = s
    assert iv.starts()[1] == -1


def test_interval_reverse_gap_blocks():
    rng = np.random.default_rng(4)
    p = random_seq(rng, 10)
    gap_b = random_seq(rng, 5)
    q = random_seq(rng, 10)
    # b = rc(p + gap + q): anchors map p->(21.. rev), q->(1.. rev)
    b = rc(p + gap_b + q)
    a = p + "TTTTT" + q
    ga, gb = Genome.from_string(a, "a"), Genome.from_string(b, "b")
    m = ma([(1, -16, 10), (16, -1, 10)])
    iv = interval_from_matches(m, np.array([0, 1]))
    rows = iv.render([ga, gb])
    t0 = rows[0].tobytes().decode().replace("-", "")
    t1 = rows[1].tobytes().decode().replace("-", "")
    assert t0 == a
    assert t1 == rc(b)  # genome b read reverse-complemented
    assert iv.lengths()[1] == 25


def test_xmfa_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    s = random_seq(rng, 300)
    a = Genome.from_string(s, name="ga", filename="ga.fa")
    b = Genome.from_string(mutate(rng, s, 0.03), name="gb",
                           filename="gb.fa")
    ivs, _ = align([a, b], AlignerConfig(seed=seedlib.get_seed(9, 0)))
    path = tmp_path / "out.xmfa"
    write_xmfa(path, ivs)
    blocks = read_xmfa(path)
    assert len(blocks) == len(ivs.intervals)
    for iv, blk in zip(ivs.intervals, blocks):
        for g in range(2):
            st = int(iv.starts()[g])
            lo, hi, strand, text = blk["seqs"][g]
            assert lo == abs(st)
            assert strand == ("+" if st >= 0 else "-")
            # ungapped text must equal the genome region (strand-aware)
            seq = [a, b][g].to_string()[lo - 1: hi]
            if strand == "-":
                seq = rc(seq)
            assert text.replace("-", "") == seq


def test_xmfa_header(tmp_path):
    a = Genome.from_string("ACGTACGTAC", name="x", filename="f.fa")
    ivs = IntervalList([], [a])
    buf = io.StringIO()
    write_xmfa(buf, ivs)
    out = buf.getvalue()
    assert out.startswith("#FormatVersion Mauve1\n")
    assert "#Sequence1File\tf.fa" in out


def test_read_xmfa_intervals_roundtrip(tmp_path):
    """XMFA -> IntervalList object model -> XMFA must be byte-stable
    (restart-from-XMFA workflows; IntervalList.h:445-616)."""
    from libmems_tpu.interval import read_xmfa_intervals

    rng = np.random.default_rng(11)
    s = random_seq(rng, 400)
    a = Genome.from_string(s, name="ga", filename="ga.fa")
    b = Genome.from_string(mutate(rng, s, 0.04), name="gb",
                           filename="gb.fa")
    ivs, _ = align([a, b], AlignerConfig(seed=seedlib.get_seed(9, 0),
                                         gapped_alignment=True))
    p1 = tmp_path / "one.xmfa"
    write_xmfa(p1, ivs)
    ivs2 = read_xmfa_intervals(p1, [a, b])
    # rendered rows of every non-empty interval agree
    orig = [iv for iv in ivs.intervals if iv.alignment_length]
    assert len(ivs2.intervals) == len(orig)
    for iv_o, iv_r in zip(orig, ivs2.intervals):
        assert np.array_equal(iv_o.starts(), iv_r.starts())
        assert np.array_equal(iv_o.lengths(), iv_r.lengths())
        assert np.array_equal(iv_o.render([a, b]), iv_r.render([a, b]))
    # and a second serialization is byte-identical
    p2 = tmp_path / "two.xmfa"
    write_xmfa(p2, ivs2)
    assert p1.read_bytes() == p2.read_bytes()


def test_read_xmfa_intervals_without_genomes(tmp_path):
    """Reader synthesizes placeholder genomes from the rows when no
    backing is given (cross-tool ingestion)."""
    from libmems_tpu.interval import read_xmfa_intervals

    txt = """#FormatVersion Mauve1
#Sequence1File\tx.fa
#Sequence2File\ty.fa
> 1:1-8 + x.fa
ACGT-ACG
T
> 2:3-9 - y.fa
ACGTTAC-
G
=
> 1:9-12 + x.fa
AAAA
=
"""
    p = tmp_path / "in.xmfa"
    p.write_text(txt)
    ivs = read_xmfa_intervals(p)
    assert len(ivs.intervals) == 2
    iv0 = ivs.intervals[0]
    assert iv0.starts().tolist() == [1, -3]
    assert iv0.lengths().tolist() == [8, 7]
    assert iv0.blocks[0].rows[0].tobytes() == b"ACGT-ACGT"
    assert iv0.blocks[0].rows[1].tobytes() == b"ACGTTAC-G"
    # synthesized genome 1 holds the ungapped forward characters
    g1 = ivs.genomes[0]
    assert g1.ascii[:8].tobytes() == b"ACGTACGT"
    assert g1.ascii[8:12].tobytes() == b"AAAA"
