"""Gapped LCB alignment + recursive anchoring, end-to-end through the
flat aligner (reference: Aligner.cpp AlignLCBInParallel + Recursion,
MuscleInterface::Align)."""

import io

import numpy as np
import pytest

import libmems_tpu as lm
from libmems_tpu.aligner import AlignerConfig, add_unaligned_intervals, align
from libmems_tpu.recursion import _local_to_global
from libmems_tpu.sequence import revcomp_ascii


def _mutate(rng, s: np.ndarray, rate: float) -> np.ndarray:
    out = s.copy()
    idx = rng.random(len(s)) < rate
    out[idx] = rng.integers(0, 4, size=int(idx.sum()))
    return out


def _to_str(codes: np.ndarray) -> str:
    return "".join("ACGT"[c] for c in codes)


@pytest.fixture(scope="module")
def mutated_pair():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, size=20000).astype(np.uint8)
    b = _mutate(rng, a, 0.02)
    # indel
    b = np.concatenate([b[:7000], b[7004:]])
    return (lm.Genome.from_string(_to_str(a), name="A"),
            lm.Genome.from_string(_to_str(b), name="B"))


def _coverage_ok(ivs, genomes):
    for g, genome in enumerate(genomes):
        cov = np.zeros(len(genome) + 1, dtype=int)
        for iv in ivs.intervals:
            le, re = int(iv.left_ends()[g]), int(iv.right_ends()[g])
            if le:
                cov[le:re + 1] += 1
        if not (cov[1:] == 1).all():
            return False
    return True


def test_gapped_alignment_full_coverage_and_content(mutated_pair):
    ga, gb = mutated_pair
    ivs, mums = align([ga, gb], AlignerConfig(gapped_alignment=True))
    assert _coverage_ok(ivs, [ga, gb])
    iv = max(ivs.intervals, key=lambda v: v.alignment_length)
    rows = iv.render(ivs.genomes)
    for g, genome in enumerate([ga, gb]):
        content = rows[g].tobytes().decode().replace("-", "")
        le, re = int(iv.left_ends()[g]), int(iv.right_ends()[g])
        assert content == genome.to_string()[le - 1:re]
    ident = ((rows[0] == rows[1]) & (rows[0] != ord("-"))).mean()
    assert ident > 0.9


def test_gapped_alignment_inverted_block():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 4, size=30000).astype(np.uint8)
    sa = _to_str(a)
    mid = revcomp_ascii(
        np.frombuffer(sa[10000:20000].encode(), np.uint8))
    b_mid = _mutate(rng, lm.sequence.translate_dna(mid), 0.01)
    sb = sa[:10000] + _to_str(b_mid) + sa[20000:]
    ga = lm.Genome.from_string(sa, name="A")
    gb = lm.Genome.from_string(sb, name="B")
    ivs, _ = align([ga, gb], AlignerConfig(gapped_alignment=True))
    assert _coverage_ok(ivs, [ga, gb])
    # the inverted LCB must render genome-1 content as reverse complement
    inv = [iv for iv in ivs.intervals
           if iv.left_ends().min() > 0 and (iv.starts() < 0).any()]
    assert inv, "expected an inverted LCB"
    iv = inv[0]
    rows = iv.render(ivs.genomes)
    g_rev = int(np.flatnonzero(iv.starts() < 0)[0])
    content = rows[g_rev].tobytes().decode().replace("-", "")
    le, re = int(iv.left_ends()[g_rev]), int(iv.right_ends()[g_rev])
    src = [ga, gb][g_rev].ascii[le - 1:re]
    assert content == revcomp_ascii(src).tobytes().decode()


def test_recursion_finds_sub_seed_anchors():
    # a 16bp shared segment inside an inter-anchor gap: invisible to the
    # top-level seed (weight 11, span 17 for ~20kb genomes) but visible
    # to the gap-sized seed (weight 7, span 13) — the reason
    # Aligner::Recursion exists (Aligner.cpp:1078).
    rng = np.random.default_rng(17)
    A1 = rng.integers(0, 4, size=10000).astype(np.uint8)
    A2 = rng.integers(0, 4, size=10000).astype(np.uint8)
    m = rng.integers(0, 4, size=16).astype(np.uint8)
    Pa = rng.integers(0, 4, size=100).astype(np.uint8)
    Qa = rng.integers(0, 4, size=100).astype(np.uint8)
    Pb = rng.integers(0, 4, size=100).astype(np.uint8)
    Qb = rng.integers(0, 4, size=100).astype(np.uint8)
    a = _to_str(np.concatenate([A1, Pa, m, Qa, A2]))
    b = _to_str(np.concatenate([A1, Pb, m, Qb, A2]))
    ga = lm.Genome.from_string(a, name="A")
    gb = lm.Genome.from_string(b, name="B")
    _, mums_plain = align([ga, gb], AlignerConfig(gapped_alignment=False))
    _, mums_rec = align([ga, gb], AlignerConfig(gapped_alignment=True,
                                                recursive=True))
    assert len(mums_rec) > len(mums_plain)
    # the new anchor covers the 16bp shared segment
    seg_start_a = 10101  # 1-based: after A1 (10000) + Pa (100)
    hit = [(s, l) for s, l in zip(mums_rec.starts, mums_rec.lengths)
           if s[0] <= seg_start_a and seg_start_a + 15 <= s[0] + l - 1]
    assert hit, mums_rec.starts


def test_local_to_global_roundtrip():
    rng = np.random.default_rng(1)
    S = rng.integers(0, 4, size=200).astype(np.uint8)
    sa = _to_str(S)
    fa = np.frombuffer(sa.encode(), np.uint8)
    for gs in (21, -21):
        n, L = 50, 7
        frag = fa[20:70] if gs > 0 else revcomp_ascii(fa[20:70])
        for sl in (3, -3, 11):
            gstart = _local_to_global(sl, L, gs, n)
            # extract via global coords
            le = abs(gstart)
            seg = fa[le - 1: le - 1 + L]
            if gstart < 0:
                seg = revcomp_ascii(seg)
            # extract via local coords
            lle = abs(sl)
            lseg = frag[lle - 1: lle - 1 + L]
            if sl < 0:
                lseg = revcomp_ascii(lseg)
            assert seg.tobytes() == lseg.tobytes(), (gs, sl)


def test_add_unaligned_intervals_partitions():
    ga = lm.Genome.from_string("ACGTACGTACGTACGTACGT", name="a")
    gb = lm.Genome.from_string("ACGTACGTACGTACGTACGT", name="b")
    from libmems_tpu.interval import Block, Interval
    s = np.array([5, 5], dtype=np.int64)
    l = np.array([8, 8], dtype=np.int64)
    iv = Interval(blocks=[Block(s, l)], seq_count=2)
    out = add_unaligned_intervals([iv], [ga, gb])
    assert _coverage_ok(type("IV", (), {"intervals": out})(), [ga, gb])


def test_xmfa_roundtrip_gapped(mutated_pair):
    ga, gb = mutated_pair
    ivs, _ = align([ga, gb], AlignerConfig(gapped_alignment=True))
    buf = io.StringIO()
    lm.write_xmfa(buf, ivs)
    buf.seek(0)
    blocks = lm.read_xmfa(buf)
    assert blocks
    # every parsed block's ungapped text must equal the genome slice
    for blk in blocks:
        for idx, entry in blk["seqs"].items():
            lo, hi, strand = entry[0], entry[1], entry[2]
            text = entry[3].replace("-", "")
            if lo == 0:
                continue
            src = [ga, gb][idx].ascii[lo - 1:hi]
            if strand == "-":
                src = revcomp_ascii(src)
            assert text == src.tobytes().decode()


def test_collinear_mode_single_lcb():
    # collinear genomes with a weak middle anchor region: collinear mode
    # must end with exactly one LCB covering everything
    rng2 = np.random.default_rng(23)
    a = rng2.integers(0, 4, size=15000).astype(np.uint8)
    b = _mutate(rng2, a, 0.02)
    ga = lm.Genome.from_string(_to_str(a), name="A")
    gb = lm.Genome.from_string(_to_str(b), name="B")
    ivs, _ = align([ga, gb], AlignerConfig(collinear=True))
    assert len(ivs.intervals) == 1


def test_lcb_extension_recovers_gap_anchor():
    # two strong LCB cores separated by a weaker (mutated) region whose
    # matches fall below the LCB weight threshold on their own; the
    # extension search must anchor the middle so coverage improves
    rng2 = np.random.default_rng(29)
    core1 = rng2.integers(0, 4, size=8000).astype(np.uint8)
    core2 = rng2.integers(0, 4, size=8000).astype(np.uint8)
    mid = rng2.integers(0, 4, size=500).astype(np.uint8)
    mid_b = _mutate(rng2, mid, 0.04)
    a = _to_str(np.concatenate([core1, mid, core2]))
    b = _to_str(np.concatenate([core1, mid_b, core2]))
    ga = lm.Genome.from_string(a, name="A")
    gb = lm.Genome.from_string(b, name="B")
    ivs_ext, mums_ext = align([ga, gb], AlignerConfig(lcb_extension=True))
    ivs_no, mums_no = align([ga, gb], AlignerConfig(lcb_extension=False))
    assert len(mums_ext) >= len(mums_no)
