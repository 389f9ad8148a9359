"""Ambiguity (N-run) masking of the mer index.

The reference masks N-runs before the SML build (maskNNNNN,
libMems/FileSML.h:135, used by dmCreate FileSML.cpp:278-314); here every
seed window overlapping a non-ACGT base carries the all-ones sentinel
key and is excluded from seeding, enumeration, and extension.  Without
this, draft-genome N-runs translate to poly-A tracts that seed false
MUMs and false backbone.
"""

import numpy as np
import pytest

from libmems_tpu import matchfind, seeds
from libmems_tpu.ops.mers import canonical_seed_keys, canonical_seed_keys_np
from libmems_tpu.sequence import Genome, ambig_mask, read_fasta
from libmems_tpu.sml import SortedMerList


def _pair_with_n_run(n=20000, run=(8000, 8150), rng_seed=3):
    rng = np.random.default_rng(rng_seed)
    base = rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
    a = base.copy()
    b = base.copy()
    a[run[0]:run[1]] = ord("N")
    b[run[0]:run[1]] = ord("N")
    return Genome("a", a), Genome("b", b), run


def test_ambig_mask_characters():
    m = ambig_mask("ACGTacgtNnRYWSKMBDHVX")
    assert not m[:8].any()
    assert m[8:].all()


def test_masked_keys_sentinel_windows():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 2000).astype(np.uint8)
    ambig = np.zeros(2000, bool)
    ambig[700:720] = True
    for w in (9, 15):
        seed = seeds.get_seed(w, 0)
        sl = seeds.seed_length(seed)
        kd = np.asarray(canonical_seed_keys(codes, seed, ambig))
        kn = canonical_seed_keys_np(codes, seed, ambig)
        assert (kd == kn).all()
        sent = ~kd.dtype.type(0)
        bad = np.flatnonzero(kd == sent)
        # exactly the windows overlapping [700, 720)
        assert bad.min() == 700 - sl + 1
        assert bad.max() == 719
        base = canonical_seed_keys_np(codes, seed)
        good = kd != sent
        assert (kd[good] == base[good]).all()


def test_no_matches_inside_n_runs_and_identical_elsewhere():
    ga, gb, (lo, hi) = _pair_with_n_run()
    seed = seeds.get_seed(11, 0)
    sa = SortedMerList.create(ga, seed)
    sb = SortedMerList.create(gb, seed)
    m = matchfind.find_mums([sa, sb])
    assert len(m) >= 2
    for st, ln in zip(m.starts, m.lengths):
        for g in range(2):
            left = abs(int(st[g]))
            right = left + int(ln) - 1
            assert right < lo + 1 or left > hi, (st, ln)
    # masked pair splits exactly at the N run: flank coverage intact
    lens = sorted(int(x) for x in m.lengths)
    assert lens[-1] >= (len(ga) - hi) - 50
    # np twin identical
    mn = matchfind.find_pair_mums_np(ga.codes, gb.codes, seed,
                                     ga.ambig, gb.ambig)
    assert np.array_equal(m.starts, mn.starts)
    assert np.array_equal(m.lengths, mn.lengths)


def test_unmasked_would_have_seeded_through_poly_a():
    """Control: without the mask the N runs (code 0 = 'A') merge the
    flanks into one false full-length match."""
    ga, gb, _ = _pair_with_n_run()
    seed = seeds.get_seed(11, 0)
    m0 = matchfind.find_pair_mums_np(ga.codes, gb.codes, seed)
    assert int(m0.lengths.max()) == len(ga)


def test_n_runs_not_aligned_across_genomes():
    """N-run only in one genome: matching region must stop at the run."""
    rng = np.random.default_rng(5)
    base = rng.choice(list(b"ACGT"), size=12000).astype(np.uint8)
    a = base.copy()
    a[5000:5100] = ord("N")
    ga, gb = Genome("a", a), Genome("b", base.copy())
    seed = seeds.get_seed(11, 0)
    m = matchfind.find_mums([SortedMerList.create(ga, seed),
                             SortedMerList.create(gb, seed)])
    for st, ln in zip(m.starts, m.lengths):
        left = abs(int(st[0]))
        right = left + int(ln) - 1
        assert right < 5001 or left > 5100


def test_genbank_fixture_with_n_run(tmp_path):
    rng = np.random.default_rng(7)
    seq = rng.choice(list("acgt"), size=3000)
    seq[1400:1450] = "n"
    body = "".join(seq)
    lines = ["LOCUS       TESTSEQ  3000 bp  DNA  linear  BCT", "ORIGIN"]
    for i in range(0, 3000, 60):
        chunk = body[i:i + 60]
        groups = " ".join(chunk[j:j + 10] for j in range(0, len(chunk), 10))
        lines.append(f"{i + 1:>9} {groups}")
    lines.append("//")
    p = tmp_path / "test.gbk"
    p.write_text("\n".join(lines) + "\n")
    (g,) = read_fasta(p)
    assert len(g) == 3000
    assert g.ambig.sum() == 50
    assert g.ambig[1400:1450].all()
    seed = seeds.get_seed(9, 0)
    sml = SortedMerList.create(g, seed)
    sent = ~np.asarray(sml.keys).dtype.type(0)
    kk = np.asarray(sml.keys)
    sl = seeds.seed_length(seed)
    assert (kk[1400 - sl + 1:1450] == sent).all()
    assert (kk[:1400 - sl + 1] != sent).all()


def test_native_sorter_masks_windows(tmp_path):
    native = pytest.importorskip("libmems_tpu.native")
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    a = rng.choice(list(b"ACGT"), size=4000).astype(np.uint8)
    a[2000:2040] = ord("N")
    g = Genome("g", a)
    seed = seeds.get_seed(11, 0)
    path = tmp_path / "g.sml"
    native.create_file_sml(g, seed, str(path))
    sml = SortedMerList.load(path)
    ref = SortedMerList.create(g, seed)
    assert np.array_equal(np.asarray(sml.keys), np.asarray(ref.keys))
    # native in-memory key oracle agrees on masked codes too
    masked_codes = np.where(g.ambig, np.uint8(0xFF), g.codes)
    nk = native.native_keys(masked_codes, seed)
    dt = np.asarray(ref.keys).dtype
    assert np.array_equal(nk.astype(dt), np.asarray(ref.keys))


def test_big_create_py_masks_windows(tmp_path):
    rng = np.random.default_rng(11)
    a = rng.choice(list(b"ACGT"), size=6000).astype(np.uint8)
    a[3000:3025] = ord("N")
    g = Genome("g", a)
    seed = seeds.get_seed(11, 0)
    path = tmp_path / "g.sml"
    sml = SortedMerList._big_create_py(g, seed, str(path),
                                       mem_limit=1 << 16)
    ref = SortedMerList.create(g, seed)
    assert np.array_equal(np.asarray(sml.keys), np.asarray(ref.keys))
    assert np.array_equal(np.asarray(sml.sorted_positions),
                          np.asarray(ref.sorted_positions))


def test_create_with_fallback_on_oom(tmp_path, monkeypatch):
    """Allocator exhaustion falls back to the out-of-core build
    (FileSML bad_alloc -> dmCreate policy, FileSML.cpp:316-374)."""
    rng = np.random.default_rng(17)
    g = Genome("g", rng.choice(list(b"ACGT"), size=5000).astype(np.uint8))
    seed = seeds.get_seed(11, 0)
    ref = SortedMerList.create(g, seed)

    real_create = SortedMerList.create

    def oom_create(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory in hbm")

    monkeypatch.setattr(SortedMerList, "create", staticmethod(oom_create))
    sml = SortedMerList.create_with_fallback(
        g, seed, sml_path=str(tmp_path / "g.sml"))
    monkeypatch.setattr(SortedMerList, "create",
                        staticmethod(real_create))
    assert np.array_equal(np.asarray(sml.keys), np.asarray(ref.keys))
    assert np.array_equal(np.asarray(sml.sorted_positions),
                          np.asarray(ref.sorted_positions))


def test_trace_mem_usage(capsys):
    from libmems_tpu import trace
    import sys
    trace.print_mem_usage("unit", stream=sys.stderr)
    err = capsys.readouterr().err
    assert "host" in err and "device" in err


# ---------------------------------------------------------------------------
# GenBank parsing scope (README "Scope limits"): LOCUS + ORIGIN only,
# multi-record and malformed-variant behavior pinned
# ---------------------------------------------------------------------------

def test_genbank_multi_record_and_features(tmp_path):
    from libmems_tpu.sequence import read_fasta
    gbk = tmp_path / "two.gbk"
    gbk.write_text(
        "LOCUS       recA 12 bp DNA\n"
        "DEFINITION  first record\n"
        "FEATURES             Location/Qualifiers\n"
        "     gene            1..12\n"
        "                     /gene=\"x\"\n"
        "ORIGIN\n"
        "        1 acgtacgtac gt\n"
        "//\n"
        "LOCUS       recB 8 bp DNA\n"
        "ORIGIN\n"
        "        1 ggggcccc\n"
        "//\n")
    gs = read_fasta(gbk, concatenate=False)
    assert [g.name for g in gs] == ["recA", "recB"]
    assert gs[0].to_string().upper() == "ACGTACGTACGT"
    assert gs[1].to_string().upper() == "GGGGCCCC"
    # concatenate=True joins records into one coordinate system,
    # exactly like multi-contig FastA
    one = read_fasta(gbk)
    assert len(one) == 1
    assert one[0].to_string().upper() == "ACGTACGTACGTGGGGCCCC"


def test_genbank_missing_terminator_flushes(tmp_path):
    from libmems_tpu.sequence import read_fasta
    gbk = tmp_path / "trunc.gbk"
    gbk.write_text(
        "LOCUS       tr1 4 bp DNA\nORIGIN\n        1 acgt\n"
        "LOCUS       tr2 4 bp DNA\nORIGIN\n        1 ttaa\n")
    gs = read_fasta(gbk, concatenate=False)
    assert [g.name for g in gs] == ["tr1", "tr2"]
    assert gs[0].to_string().upper() == "ACGT"
    assert gs[1].to_string().upper() == "TTAA"
