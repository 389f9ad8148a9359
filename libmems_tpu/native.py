"""ctypes bridge to the native out-of-core SML builder (dmSML analog).

Loads ``native/libdmsml.so`` (compiling it with g++ on first use — the
toolchain is part of the deployment image; there is no pip dependency),
exposing:

* ``native_keys(codes, seed)`` — C canonical-key extraction, used as a
  third bit-parity oracle against the JAX and numpy implementations;
* ``create_file_sml(genome, seed, out_path, ...)`` — the
  FileSML::dmCreate path (FileSML.cpp:278-314): stream the genome once,
  write position-order keys, distribution-sort (key, pos) records
  through scratch bins with threaded I/O overlap, emit a standard
  SMLT0001 file loadable by SortedMerList.load().

When the shared library cannot be built (no compiler), callers fall
back to the in-memory device sort (SortedMerList.create) — mirroring
the reference's RAM-first, dmSML-on-bad_alloc policy (FileSML.cpp:316).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

from libmems_tpu.sequence import Genome

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "dmsml.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libdmsml.so")

_lib = None
_lib_err: str | None = None


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-pthread", _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.dmsml_keys.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)]
        lib.dmsml_keys.restype = None
        lib.dmsml_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int]
        lib.dmsml_create.restype = ctypes.c_int
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as e:
        _lib_err = str(e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def native_keys(codes: np.ndarray, seed: int) -> np.ndarray:
    """Canonical seed keys via the C implementation (uint64)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_lib_err}")
    from libmems_tpu import seeds as seedlib
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = len(codes)
    windows = max(n - seedlib.seed_length(seed) + 1, 0)
    out = np.zeros(windows, dtype=np.uint64)
    if windows:
        lib.dmsml_keys(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_uint64(n), ctypes.c_uint64(seed),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def create_file_sml(genome_or_codes, seed: int, out_path: str,
                    scratch_dir: str | None = None,
                    mem_limit: int = 256 << 20,
                    circular: bool = False) -> str:
    """Build an SMLT0001 file out-of-core (dmSML / FileSML::dmCreate
    equivalent).  Returns out_path; load with SortedMerList.load()."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_lib_err}")
    if isinstance(genome_or_codes, Genome):
        codes = genome_or_codes.codes
        if genome_or_codes.ambig.any():
            # positions with ambiguous bases carry byte 0xFF in the
            # streamed codes file; the native sorter sentinel-keys every
            # window overlapping one (maskNNNNN, libMems/FileSML.h:135)
            codes = np.where(genome_or_codes.ambig,
                             np.uint8(0xFF), codes)
    else:
        codes = np.asarray(genome_or_codes, dtype=np.uint8)
    if scratch_dir is None:
        scratch_dir = os.path.dirname(os.path.abspath(out_path)) or "."
    with tempfile.NamedTemporaryFile(dir=scratch_dir, suffix=".codes",
                                     delete=False) as tf:
        codes_path = tf.name
        np.ascontiguousarray(codes, dtype=np.uint8).tofile(tf)
    try:
        rc = lib.dmsml_create(
            codes_path.encode(), os.fspath(out_path).encode(),
            os.fspath(scratch_dir).encode(), ctypes.c_uint64(seed),
            ctypes.c_uint64(mem_limit), ctypes.c_int(int(circular)))
        if rc != 0:
            raise RuntimeError(f"dmsml_create failed with code {rc}")
    finally:
        os.unlink(codes_path)
    return os.fspath(out_path)
