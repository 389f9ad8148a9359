"""Quick /verify drive: FASTA -> align -> XMFA round-trip + dryrun.
Run with the scrubbed CPU env (see .claude/skills/verify/SKILL.md)."""
import numpy as np, tempfile, os
import libmems_tpu as lm

rng = np.random.default_rng(1)
anc = rng.integers(0, 4, 60_000).astype(np.uint8)
b = anc.copy()
seg = 3 - b[10_000:18_000][::-1]
b = np.concatenate([b[:10_000], seg, b[18_000:]])
blk = b[30_000:36_000]; rest = np.concatenate([b[:30_000], b[36_000:]])
b = np.concatenate([rest[:45_000], blk, rest[45_000:]])
idx = rng.random(len(b)) < 0.01
b[idx] = rng.integers(0, 4, int(idx.sum())).astype(np.uint8)

alpha = np.array(list("ACGT"))
d = tempfile.mkdtemp()
for name, g in [("a", anc), ("b", b)]:
    with open(os.path.join(d, name + ".fa"), "w") as f:
        f.write(">" + name + "\n" + "".join(alpha[g]) + "\n")

gs = lm.read_fasta(os.path.join(d, "a.fa")) + lm.read_fasta(os.path.join(d, "b.fa"))
ivs, mums = lm.align(gs, lm.AlignerConfig())
out = os.path.join(d, "out.xmfa")
lm.write_xmfa(out, ivs)
back = lm.read_xmfa(out)
assert len(back) == len(ivs.intervals) > 0
txt = open(out).read()
assert txt.count(" - ") >= 1, "expected a minus-strand XMFA row"
try:
    lm.Genome.from_string("AC-GT")
    raise SystemExit("GAP ACCEPTED (BAD)")
except ValueError:
    pass
import __graft_entry__ as g
fn, args = g.entry()
import jax
jax.jit(fn)(*args)
g.dryrun_multichip(8)
print("VERIFY DRIVE OK:", len(ivs.intervals), "intervals,", len(mums), "anchors")
