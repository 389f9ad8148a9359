"""External gapped-aligner adapter (subprocess pattern) tests.

Exercises the pipeExec-style adapter hermetically with a fake aligner
script (no real muscle/clustalw in the image)."""

import os
import stat
import sys

import numpy as np
import pytest

from libmems_tpu.external import (ExternalGappedAligner,
                                  align_codes_external_or_native,
                                  clustalw_adapter, muscle_adapter)

FAKE_ALIGNER = """#!{python}
import sys
# read FastA from stdin, pad every sequence to max length with '-'
seqs, names, cur = [], [], None
for line in sys.stdin.read().splitlines():
    if line.startswith('>'):
        names.append(line)
        seqs.append([])
    elif line.strip():
        seqs[-1].append(line.strip())
seqs = [''.join(s) for s in seqs]
width = max(len(s) for s in seqs)
for n, s in zip(names, seqs):
    print(n)
    print(s + '-' * (width - len(s)))
"""

FAIL_ALIGNER = "#!{python}\nimport sys; sys.exit(3)\n"


def _script(tmp_path, body, name):
    p = tmp_path / name
    p.write_text(body.format(python=sys.executable))
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


def test_pipe_adapter_roundtrip(tmp_path):
    exe = _script(tmp_path, FAKE_ALIGNER, "fakealn")
    ad = ExternalGappedAligner([exe], name="fake")
    assert ad.available()
    seqs = [np.array([0, 1, 2, 3, 0, 1], np.uint8),
            np.array([0, 1, 2], np.uint8)]
    rows = ad.align_codes(seqs)
    assert rows.shape == (2, 6)
    assert rows[0].tobytes() == b"ACGTAC"
    assert rows[1].tobytes() == b"ACG---"


def test_failure_dumps_reproducer(tmp_path):
    exe = _script(tmp_path, FAIL_ALIGNER, "failaln")
    ad = ExternalGappedAligner([exe], name="fail",
                               failure_dir=str(tmp_path))
    with pytest.raises(RuntimeError, match="dumped"):
        ad.align_codes([np.array([0, 1], np.uint8),
                        np.array([2, 3], np.uint8)])
    dumps = [f for f in os.listdir(tmp_path)
             if f.startswith("muscle_failure_")]
    assert dumps, "reproducer file not written"


def test_fallback_to_native_engine(tmp_path):
    exe = _script(tmp_path, FAIL_ALIGNER, "failaln2")
    ad = ExternalGappedAligner([exe], name="fail",
                               failure_dir=str(tmp_path))
    rng = np.random.default_rng(0)
    s = rng.integers(0, 4, 40).astype(np.uint8)
    seqs = [s, np.concatenate([s[:18], s[22:]])]
    rows = align_codes_external_or_native(seqs, ad)
    assert rows.shape[0] == 2 and rows.shape[1] >= 40


def test_missing_binary_unavailable():
    assert not ExternalGappedAligner(["definitely-not-a-binary-xyz"]
                                     ).available()
    # stock adapters construct fine whether or not binaries exist
    muscle_adapter()
    clustalw_adapter()
