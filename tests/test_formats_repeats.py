"""Repeat discovery + output formats (reference: RepeatHash.cpp,
gnAlignedSequences.cpp, Aligner::WritePermutation, Islands.cpp)."""

import io

import numpy as np
import pytest

import libmems_tpu as lm
from libmems_tpu.formats import (read_clustalw, read_interval_list,
                                 read_phylip, simple_find_backbone,
                                 simple_find_islands, write_clustalw,
                                 write_fasta_msa, write_interval_list,
                                 write_islands, write_mega, write_msf,
                                 write_nexus, write_permutation,
                                 write_permutation_coordinates,
                                 write_phylip, write_simple_backbone)
from libmems_tpu.repeats import find_repeats, write_repeat_list
from libmems_tpu.sequence import revcomp_ascii
from libmems_tpu import seeds as seedlib

rng = np.random.default_rng(0)


def to_str(c):
    return "".join("ACGT"[x] for x in c)


# -- repeats -----------------------------------------------------------------

def test_find_repeats_direct():
    unit = rng.integers(0, 4, size=120).astype(np.uint8)
    mid = rng.integers(0, 4, size=200).astype(np.uint8)
    s = np.concatenate([unit, mid, unit])
    seed = seedlib.get_seed(9, 0)
    reps = find_repeats(to_str(s), seed=seed, min_length=50)
    assert len(reps) >= 1
    # one family must pair position 1 with position 321 (1-based), len 120
    hit = [i for i in range(len(reps))
           if set(np.abs(reps.starts[i][reps.starts[i] != 0]).tolist())
           == {1, 321} and reps.lengths[i] >= 120]
    assert hit, (reps.starts, reps.lengths)


def test_find_repeats_inverted():
    unit = rng.integers(0, 4, size=150).astype(np.uint8)
    mid = rng.integers(0, 4, size=100).astype(np.uint8)
    inv = (3 - unit)[::-1]
    s = np.concatenate([unit, mid, inv])
    seed = seedlib.get_seed(9, 0)
    reps = find_repeats(to_str(s), seed=seed, min_length=100)
    # the inverted copy must appear with opposite sign
    found = False
    for i in range(len(reps)):
        occ = reps.starts[i][reps.starts[i] != 0]
        if len(occ) == 2 and (occ > 0).sum() == 1 and reps.lengths[i] >= 140:
            found = True
    assert found, (reps.starts, reps.lengths)


def test_write_repeat_list():
    unit = rng.integers(0, 4, size=100).astype(np.uint8)
    s = np.concatenate([unit, unit])
    reps = find_repeats(to_str(s), seed=seedlib.get_seed(9, 0))
    buf = io.StringIO()
    write_repeat_list(buf, reps, "test.fa", len(s))
    text = buf.getvalue()
    assert text.startswith("FormatVersion\t3")
    assert f"MatchCount\t{len(reps)}" in text


# -- MSA formats -------------------------------------------------------------

@pytest.fixture
def rows():
    return np.stack([
        np.frombuffer(b"ACGTACGTACGT--A", dtype=np.uint8),
        np.frombuffer(b"ACGT-CGTACGTGGA", dtype=np.uint8),
        np.frombuffer(b"ACTTACGT-CGTGGA", dtype=np.uint8)])


def test_phylip_roundtrip(rows):
    buf = io.StringIO()
    write_phylip(buf, rows, ["alpha", "beta", "gamma"], width=7)
    buf.seek(0)
    back, names = read_phylip(buf)
    assert names == ["alpha", "beta", "gamma"]
    assert (back == rows).all()


def test_clustalw_roundtrip(rows):
    buf = io.StringIO()
    write_clustalw(buf, rows, ["a", "b", "c"], width=6)
    buf.seek(0)
    back, names = read_clustalw(buf)
    assert names == ["a", "b", "c"]
    assert (back == rows).all()


def test_other_writers_smoke(rows):
    for writer in (write_msf, write_nexus, write_mega, write_fasta_msa):
        buf = io.StringIO()
        writer(buf, rows, ["a", "b", "c"])
        assert len(buf.getvalue()) > rows.shape[1]
    # MSF uses '.' for gaps
    buf = io.StringIO()
    write_msf(buf, rows)
    assert "." in buf.getvalue() and "-" not in \
        buf.getvalue().split("//")[1]


def test_msf_nexus_mega_fasta_roundtrip(rows):
    from libmems_tpu.formats import (read_fasta_msa, read_mega, read_msf,
                                     read_nexus, write_msf, write_nexus,
                                     write_mega, write_fasta_msa)
    pairs = [(write_msf, read_msf), (write_nexus, read_nexus),
             (write_mega, read_mega), (write_fasta_msa, read_fasta_msa)]
    for writer, reader in pairs:
        buf = io.StringIO()
        writer(buf, rows, ["a", "b", "c"])
        buf.seek(0)
        back, names = reader(buf)
        assert names == ["a", "b", "c"], reader.__name__
        assert (back == rows).all(), reader.__name__


def test_interval_xml(rearranged_pair):
    from libmems_tpu.formats import write_interval_xml
    buf = io.StringIO()
    write_interval_xml(buf, rearranged_pair)
    text = buf.getvalue()
    import xml.etree.ElementTree as ET
    root = ET.fromstring(text)
    assert root.tag == "Alignment"
    ivs = root.findall("Interval")
    assert len(ivs) == len(rearranged_pair)
    # the inverted block must appear as a reverse-orientation segment
    orients = {seg.get("orientation") for iv in ivs
               for seg in iv.findall("Segment")}
    assert "reverse" in orients and "forward" in orients


# -- permutations / islands / backbone ---------------------------------------

@pytest.fixture(scope="module")
def rearranged_pair():
    r = np.random.default_rng(5)
    a = r.integers(0, 4, size=30000).astype(np.uint8)
    sa = to_str(a)
    b1, b2, b3 = sa[:10000], sa[10000:20000], sa[20000:]
    inv = revcomp_ascii(np.frombuffer(b2.encode(), np.uint8)
                        ).tobytes().decode()
    sb = b3 + inv + b1
    ga = lm.Genome.from_string(sa, name="A")
    gb = lm.Genome.from_string(sb, name="B")
    ivs, _ = lm.align([ga, gb], lm.AlignerConfig(gapped_alignment=False))
    return ivs


def test_write_permutation(rearranged_pair):
    buf = io.StringIO()
    write_permutation(buf, rearranged_pair)
    lines = buf.getvalue().splitlines()
    assert len(lines) == 2
    p0 = lines[0].split("\t")
    p1 = lines[1].split("\t")
    assert sorted(abs(int(x)) for x in p0) == [0, 1, 2]
    assert sorted(abs(int(x)) for x in p1) == [0, 1, 2]
    assert p0 != p1  # rearranged
    assert any(x.startswith("-") for x in p1) or \
        any(x.startswith("-") for x in p0)


def test_write_permutation_coordinates(rearranged_pair):
    buf = io.StringIO()
    write_permutation_coordinates(buf, rearranged_pair)
    lines = buf.getvalue().splitlines()
    assert lines[0].startswith("#seq0_leftend")
    assert len(lines) == 4  # header + 3 LCBs


def test_simple_islands_and_backbone():
    r = np.random.default_rng(6)
    core = r.integers(0, 4, size=3000).astype(np.uint8)
    ins = r.integers(0, 4, size=400).astype(np.uint8)
    a = to_str(core)
    b = to_str(np.concatenate([core[:1500], ins, core[1500:]]))
    ga = lm.Genome.from_string(a, name="A")
    gb = lm.Genome.from_string(b, name="B")
    ivs, _ = lm.align([ga, gb], lm.AlignerConfig(gapped_alignment=True))
    islands = simple_find_islands(ivs, island_size=100)
    assert islands, "the 400bp insertion must be an island"
    buf = io.StringIO()
    write_islands(buf, islands)
    assert len(buf.getvalue().splitlines()) == len(islands)
    bb = simple_find_backbone(ivs, backbone_size=50, max_gap_size=50)
    assert bb
    cov = np.zeros(len(ga) + 1, dtype=bool)
    for seg in bb:
        lo, hi = sorted(abs(int(x)) for x in seg[0])
        cov[lo:hi + 1] = True
    assert cov[1:].mean() > 0.8
    buf = io.StringIO()
    write_simple_backbone(buf, bb)
    assert len(buf.getvalue().splitlines()) == len(bb)


def test_interval_list_roundtrip(rearranged_pair):
    ivs = rearranged_pair
    buf = io.StringIO()
    write_interval_list(buf, ivs)
    buf.seek(0)
    back = read_interval_list(buf, ivs.genomes)
    assert len(back.intervals) == len(ivs.intervals)
    for a, b in zip(ivs.intervals, back.intervals):
        assert (a.starts() == b.starts()).all()
        assert (a.render(ivs.genomes) == b.render(ivs.genomes)).all()
