"""Optional native (ctypes) rANS-4x8 kernels: decode, plus the r11
encode state walks (the Python encoder in ``formats/rans.py`` computes
the tables and serializes the format; C only runs the reverse walk, so
streams are byte-identical with or without the kernel).

The CRAM scan's hot loop on htslib/htsjdk-produced archives is rANS
block decode (reference: `CRAMRecordReader.java:33-56` delegates to
htsjdk's C-backed codecs; htslib itself is C). A per-byte Python
decoder tops out ~3 MB/s; the numpy lockstep decoder
(`formats/rans_vec.py`) wins only when many similar-length blocks
decode together (true at 32 MB production splits, not at small bench
splits). This module closes the gap portably: ~80 lines of C written
from the CRAM 3.0 spec §13, compiled ONCE per machine with the system
C compiler into a per-user cache dir, loaded via ctypes.

Strictly optional: if there is no compiler, compilation fails, or the
sandbox forbids dlopen, ``decode()`` returns ``None`` and callers fall
back to the numpy/scalar decoders — behavior is identical, only slower.
On a real cluster either every executor pays one ~200 ms compile, or
ops ship the prebuilt ``.so`` with ``--files`` and set
``SPARK_GRAFT_RANS_SO``. Set ``SPARK_GRAFT_NO_NATIVE=1`` to disable
(tests use this to exercise the pure-Python paths).

The C source mirrors ``formats/cram.py:rans_decode`` exactly (same
freq-table RLE reader, same renorm semantics, same truncation errors);
``tests/test_rans.py`` asserts byte parity against the scalar decoder
on random and adversarial streams.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

#: the kernel source lives in rans_kernel.c — ONE file that both the
#: packaged setup.py extension (built at pip-install time, optional) and
#: this JIT path compile; the sha cache tag derives from its bytes so a
#: source change can never pair with a stale .so
with open(os.path.join(os.path.dirname(__file__), "rans_kernel.c"),
          encoding="utf-8") as _fh:
    _C_SOURCE = _fh.read()

_lock = threading.Lock()
_lib = None          # ctypes lib once loaded
_lib_path = None     # which .so engaged (env / packaged / JIT cache)
_failed = False      # sticky: never retry a failed compile in-process


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "hadoop_bam_spark")
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    """Compile the kernel into the cache dir; returns the .so path or
    None. Cross-process race-safe TWO ways: an advisory flock on a
    sidecar lockfile makes exactly one of N concurrent executor
    processes compile (the other 31 block a few hundred ms, then see the
    finished .so), and the atomic rename keeps even lock-less
    filesystems correct (worst case: redundant compiles, never a torn
    .so)."""
    tag = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    so = os.path.join(_cache_dir(), f"rans_{tag}.so")
    if os.path.exists(so):
        return so
    lock_fh = None
    try:
        try:
            import fcntl

            lock_fh = open(so + ".lock", "a+b")
            fcntl.flock(lock_fh, fcntl.LOCK_EX)  # blocks while a peer builds
            if os.path.exists(so):  # peer won the race while we waited
                return so
        except (ImportError, OSError):
            # no flock on this platform/FS: the atomic rename below still
            # guarantees correctness, only redundant compiles remain
            if lock_fh is not None:
                lock_fh.close()
            lock_fh = None
        cc = os.environ.get("CC", "cc")
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "rans.c")
            tmp_so = os.path.join(td, "rans.so")
            with open(src, "w") as fh:
                fh.write(_C_SOURCE)
            try:
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", "-o", tmp_so, src],
                    check=True, capture_output=True, timeout=60,
                )
            except (OSError, subprocess.SubprocessError):
                return None
            try:
                os.replace(tmp_so, so)  # same-FS? tempdir may differ -> copy
            except OSError:
                import shutil

                shutil.copy(tmp_so, so + f".tmp{os.getpid()}")
                os.replace(so + f".tmp{os.getpid()}", so)
        try:
            # the .so now exists, so every future caller returns before
            # ever touching the lock path; dropping the sidecar keeps the
            # cache dir from accumulating one .lock per source revision.
            # A peer blocked on the old inode still wakes, re-checks
            # os.path.exists(so), and returns early — and the atomic
            # rename above keeps even a re-created-lock race correct.
            os.unlink(so + ".lock")
        except OSError:
            pass
        return so
    finally:
        # one finally covers EVERY exit (compile, peer-won early return,
        # exceptions): close releases the flock deterministically rather
        # than leaning on refcounting GC (PyPy would otherwise hold the
        # exclusive lock until an arbitrary collection point)
        if lock_fh is not None:
            lock_fh.close()


def _packaged_so() -> str | None:
    """The .so built at pip-install time by setup.py's OPTIONAL
    extension (Extension(..., optional=True): a missing compiler skips
    the build instead of failing the install). The glob covers
    ABI-tagged names (``_rans_kernel.cpython-311-x86_64-linux-gnu.so``);
    ctypes dlopen doesn't need the PyInit entry point a real import
    would. Checked before the JIT build so installed wheels never pay
    the per-machine compile."""
    import glob

    hits = sorted(glob.glob(
        os.path.join(os.path.dirname(__file__), "_rans_kernel*.so")))
    return hits[0] if hits else None


def _load():
    global _lib, _lib_path, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if os.environ.get("SPARK_GRAFT_NO_NATIVE"):
            _failed = True
            return None
        so = (os.environ.get("SPARK_GRAFT_RANS_SO") or _packaged_so()
              or _build())
        if not so:
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
            for fn in (lib.rans_decode0, lib.rans_decode1):
                fn.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64,
                    ctypes.c_char_p, ctypes.c_int64,
                ]
                fn.restype = ctypes.c_int
        except OSError:
            _failed = True
            return None
        try:
            # encode walks added in r11 — a prebuilt pre-r11 .so shipped
            # via SPARK_GRAFT_RANS_SO lacks them; decode still works and
            # the encoders fall back to the Python walk
            for fn in (lib.rans_encode0_walk, lib.rans_encode1_walk):
                fn.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64,
                    ctypes.c_char_p, ctypes.c_char_p,
                    ctypes.c_char_p, ctypes.c_int64,
                    ctypes.c_char_p,
                ]
                fn.restype = ctypes.c_int64
            lib._has_encode = True
        except AttributeError:
            lib._has_encode = False
        _lib = lib
        _lib_path = so
        return _lib


def available() -> bool:
    return _load() is not None


def loaded_path() -> str | None:
    """Path of the engaged .so (None if the native layer is off) —
    diagnostics for which source won: SPARK_GRAFT_RANS_SO, the packaged
    extension, or the JIT cache."""
    _load()
    return _lib_path


def encode_walk(data: bytes, order: int, freq_u16: bytes,
                cum_u16: bytes) -> tuple[bytes, tuple] | None:
    """Run the reverse rANS state walk natively with caller-computed
    tables: ``freq_u16``/``cum_u16`` are little-endian uint16 buffers
    (256 entries order-0, 256*256 ctx-major order-1, summing to 4096
    per table for occurring symbols). Returns (renorm bytes in FINAL
    stream order, 4 final states) — byte-identical to the Python walk
    in formats/rans.py by construction — or None when the native
    kernel (or its encode symbols) is unavailable."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_encode", False):
        return None
    n = len(data)
    rev_cap = 4 * n + 64
    rev = ctypes.create_string_buffer(rev_cap)
    states = (ctypes.c_uint32 * 4)()
    fn = lib.rans_encode0_walk if order == 0 else lib.rans_encode1_walk
    k = fn(data, n, freq_u16, cum_u16, rev, rev_cap,
           ctypes.cast(states, ctypes.c_char_p))
    if k < 0:
        return None  # cannot happen with valid tables; Python walk decides
    return rev.raw[:k][::-1], tuple(states)


def decode(data: bytes, order: int, n_out: int) -> bytes | None:
    """Decode the post-header stream ``data`` (order 0/1) to ``n_out``
    raw bytes. Returns None when the native kernel is unavailable;
    raises ValueError on truncated/invalid input (matching the scalar
    decoder's errors)."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(n_out)
    fn = lib.rans_decode0 if order == 0 else lib.rans_decode1
    rc = fn(data, len(data), out, n_out)
    if rc != 0:
        raise ValueError("truncated rANS block")
    return out.raw
