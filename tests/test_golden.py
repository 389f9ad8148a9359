"""Byte-pinned self-goldens for the BASELINE configs (scaled).

Regenerates every output with tests/golden/generate.py and compares
byte-for-byte against the committed files.  Catches silent output drift
in any serialization or pipeline stage between rounds; intentional
changes re-run ``python -m tests.golden.generate`` and commit the diff.
"""

import os

import pytest

from tests.golden import generate


@pytest.mark.slow
def test_golden_outputs_are_byte_stable():
    missing = []
    drift = []
    for name, data in generate.all_outputs().items():
        path = os.path.join(generate.GOLDEN_DIR, name)
        if not os.path.exists(path):
            missing.append(name)
            continue
        with open(path, "rb") as fh:
            pinned = fh.read()
        if pinned != data:
            drift.append(name)
    assert not missing, f"golden files missing: {missing}"
    assert not drift, (
        f"golden drift in {drift}: if intentional, re-run "
        f"`python -m tests.golden.generate` and commit the new files")
