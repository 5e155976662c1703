"""Ahead-of-need native plugin builder.

TPU-side counterpart of the reference's runtime CUDA plugin compiler
(`/root/reference/lib/model_zoo/stylegan_utils/custom_ops.py:46-124`): the
reference hashes sources, builds a torch cpp_extension into a digest-named
cache dir under a file lock, and caches the loaded module.  Here the device
code needs no plugin (XLA/Pallas compile it), so the builder targets the
*host* runtime: it compiles C++ shared libraries with g++ into an
md5-digested cache directory, guarded by an O_EXCL lock file, and loads them
with ctypes.  Build failures degrade gracefully (callers fall back to their
pure-Python paths), mirroring `upfirdn2d.py:235-239`.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import sys
import tempfile
import time

_CACHE = {}

_CXX_FLAGS = ["-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
              "-pthread", "-fvisibility=hidden"]


def _cache_root():
    root = os.environ.get("SHGAN_NATIVE_CACHE")
    if root is None:
        root = os.path.join(tempfile.gettempdir(),
                            f"shgan_tpu_native_{os.getuid()}")
    os.makedirs(root, exist_ok=True)
    return root


class _FileLock:
    """O_EXCL-based cross-process build lock (role of the reference's
    FileBaton, custom_ops.py:95-105)."""

    def __init__(self, path, timeout=120.0):
        self.path = path
        self.timeout = timeout
        self.fd = None

    def __enter__(self):
        deadline = time.time() + self.timeout * 2
        while True:
            try:
                self.fd = os.open(self.path,
                                  os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                return self
            except FileExistsError:
                # staleness is the age of the LOCK FILE, not this waiter's
                # patience: two impatient waiters judging by their own
                # deadlines could unlink each other's fresh locks and both
                # enter the critical section (two g++ processes writing
                # the same .so.tmp → corrupt published library)
                try:
                    age = time.time() - os.path.getmtime(self.path)
                except OSError:
                    continue  # holder released between create and stat
                if age > self.timeout:
                    try:
                        os.unlink(self.path)  # holder died mid-build
                    except OSError:
                        pass
                elif time.time() > deadline:
                    raise TimeoutError(
                        f"build lock {self.path} held by a live builder "
                        f"for >{self.timeout * 2:.0f}s")
                time.sleep(0.05)

    def __exit__(self, *exc):
        if self.fd is not None:
            os.close(self.fd)
        try:
            os.unlink(self.path)
        except OSError:
            pass


def get_plugin(name, sources, extra_flags=(), verbose=False):
    """Compile+load (or load cached) a C++ shared library.

    Args:
        name: plugin name; the exported symbols' library.
        sources: list of absolute .cpp paths.
        extra_flags: extra g++ flags.

    Returns a ``ctypes.CDLL`` or raises ``RuntimeError`` on build failure.
    Results (including failures) are memoized per process.
    """
    key = (name, tuple(sources), tuple(extra_flags))
    if key in _CACHE:
        result = _CACHE[key]
        if isinstance(result, Exception):
            raise result
        return result
    try:
        lib = _build_and_load(name, sources, extra_flags, verbose)
    except Exception as e:  # noqa: BLE001 — callers fall back to Python
        _CACHE[key] = RuntimeError(f"native build of {name!r} failed: {e}")
        raise _CACHE[key] from e
    _CACHE[key] = lib
    return lib


def _build_and_load(name, sources, extra_flags, verbose):
    digest = hashlib.md5()
    digest.update(" ".join(_CXX_FLAGS + list(extra_flags)).encode())
    for src in sources:
        with open(src, "rb") as f:
            digest.update(f.read())
    build_dir = os.path.join(_cache_root(), f"{name}-{digest.hexdigest()}")
    so_path = os.path.join(build_dir, f"lib{name}.so")

    if not os.path.exists(so_path):
        os.makedirs(build_dir, exist_ok=True)
        with _FileLock(os.path.join(build_dir, ".lock")):
            if not os.path.exists(so_path):  # re-check under the lock
                cxx = (os.environ.get("CXX") or shutil.which("g++")
                       or shutil.which("c++"))
                if cxx is None:
                    raise RuntimeError("no C++ compiler found")
                tmp = so_path + ".tmp"
                cmd = ([cxx] + _CXX_FLAGS + list(extra_flags)
                       + list(sources) + ["-o", tmp])
                if verbose:
                    print("[shgan_tpu.native]", " ".join(cmd),
                          file=sys.stderr)
                proc = subprocess.run(cmd, capture_output=True, text=True)
                if proc.returncode != 0:
                    raise RuntimeError(proc.stderr[-2000:])
                os.replace(tmp, so_path)  # atomic publish
    return ctypes.CDLL(so_path)
