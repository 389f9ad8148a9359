"""End-to-end wall-clock benchmarks (BASELINE.md configs 1/3/4).

Runs on the real TPU chip:
  A. 2 x 4.6 Mbp synthetic pair -> align() (LCBs + gapped intervals) ->
     XMFA (config 1+3)
  B. 9 x ~1 Mbp synthetic enterobacteria-like set -> progressive_align
     -> backbone detection+application -> XMFA (config 4)

Prints one JSON line per phase to stdout; wall-clock numbers are copied
into README.md's performance table.  bench.py (the driver metric)
remains the MUM-throughput benchmark.
"""

import json
import sys
import time

import numpy as np

from bench import _synthetic_pair


def _mutant_family(n_genomes, length, rng_seed=0, mutate=0.01,
                   indel=0.0002, rearrange=2):
    """Star-phylogeny family: independent mutants of one ancestor with a
    couple of segmental rearrangements each."""
    rng = np.random.default_rng(rng_seed)
    anc = rng.integers(0, 4, size=length).astype(np.uint8)
    out = []
    for gi in range(n_genomes):
        g = anc.copy()
        idx = rng.random(length) < mutate
        g[idx] = rng.integers(0, 4, size=int(idx.sum())).astype(np.uint8)
        if indel > 0:
            sites = np.flatnonzero(rng.random(len(g)) < indel)
            parts, cur = [], 0
            for s in sites:
                if s < cur:
                    continue
                z = int(rng.geometric(0.5))
                parts.append(g[cur:s])
                if rng.random() < 0.5:
                    parts.append(rng.integers(0, 4, size=z).astype(np.uint8))
                    cur = s
                else:
                    cur = s + z
            parts.append(g[cur:])
            g = np.concatenate(parts)
        for _ in range(rearrange):
            L = len(g)
            a = int(rng.integers(0, L - 20_000))
            b = a + int(rng.integers(5_000, 20_000))
            seg = g[a:b]
            if rng.random() < 0.5:  # inversion
                seg = 3 - seg[::-1]
                g = np.concatenate([g[:a], seg, g[b:]])
            else:                   # translocation
                rest = np.concatenate([g[:a], g[b:]])
                at = int(rng.integers(0, len(rest)))
                g = np.concatenate([rest[:at], seg, rest[at:]])
        out.append(g)
    return out


def phase_pair_to_xmfa(tmpdir):
    from libmems_tpu.aligner import AlignerConfig, align
    from libmems_tpu.interval import write_xmfa
    from libmems_tpu.sequence import Genome

    L = 4_600_000
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)

    def run(rng_seed, out):
        a, b = _synthetic_pair(L, rng_seed=rng_seed)
        genomes = [Genome(name="A", ascii=lut[a], codes=a),
                   Genome(name="B", ascii=lut[b], codes=b)]
        t0 = time.perf_counter()
        ivs, mums = align(genomes, AlignerConfig(gapped_alignment=True,
                                                 recursive=False))
        write_xmfa(out, ivs)
        return time.perf_counter() - t0, ivs, mums

    # first run pays per-process one-time costs (cached-executable
    # loads); the second, on a DIFFERENT genome pair, is the marginal
    # per-alignment cost a long-running service sees
    dt1, ivs, mums = run(0, f"{tmpdir}/pair.xmfa")
    dt2, _, _ = run(1, f"{tmpdir}/pair2.xmfa")
    print(json.dumps({
        "metric": "pair_align_to_xmfa_s", "value": round(dt1, 2),
        "unit": "s", "bases": 2 * L, "n_mums": len(mums),
        "n_intervals": len(ivs.intervals),
        "bases_per_s": round(2 * L / dt1, 1),
        "marginal_s": round(dt2, 2),
        "marginal_bases_per_s": round(2 * L / dt2, 1)}), flush=True)


def phase_progressive_9(tmpdir, n=9, length=1_000_000):
    from libmems_tpu.backbone import (apply_backbone,
                                      write_backbone_columns,
                                      write_backbone_seq_coordinates)
    from libmems_tpu.interval import write_xmfa
    from libmems_tpu.progressive import ProgressiveConfig, progressive_align
    from libmems_tpu.sequence import Genome

    fam = _mutant_family(n, length)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [Genome(name=f"g{i}", ascii=lut[g], codes=g)
               for i, g in enumerate(fam)]
    t0 = time.perf_counter()
    ivs, tree = progressive_align(
        genomes, ProgressiveConfig(refine=False))
    t1 = time.perf_counter()
    new_ivs, segments = apply_backbone(ivs)
    write_xmfa(f"{tmpdir}/nine.xmfa", new_ivs)
    write_backbone_seq_coordinates(f"{tmpdir}/nine.bbseq", segments, n)
    write_backbone_columns(f"{tmpdir}/nine.bbcols", segments)
    t2 = time.perf_counter()
    total = sum(len(g) for g in fam)
    print(json.dumps({
        "metric": "progressive9_to_xmfa_s", "value": round(t2 - t0, 2),
        "unit": "s", "bases": total, "align_s": round(t1 - t0, 2),
        "backbone_s": round(t2 - t1, 2),
        "n_intervals": len(new_ivs.intervals),
        "n_backbone_segments": len(segments),
        "bases_per_s": round(total / (t2 - t0), 1)}), flush=True)


def main():
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        if "--nine-only" not in sys.argv:
            phase_pair_to_xmfa(td)
        if "--pair-only" not in sys.argv:
            phase_progressive_9(td)


if __name__ == "__main__":
    main()
