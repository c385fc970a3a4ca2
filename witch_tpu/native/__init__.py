"""Native host kernels (C++, CPython C API).

The compiled extensions (_oa, _pairhmm, _domaindef) are not committed;
they are built by ``python setup.py build_ext --inplace`` (CI does this)
or, as a fallback, compiled on first import here so a fresh checkout
works without a manual build step. Build output goes to stderr only on
failure; importers fall back to their numpy paths when the build fails.

Concurrent interpreters (pytest-xdist, spawned workers) serialize the
first-import build through an exclusive file lock; whoever loses the
race waits for the winner and then just re-checks for the .so files.
Set WITCH_TPU_NO_AUTOBUILD=1 to disable the auto-build entirely.
"""

import importlib
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(os.path.dirname(_HERE))
_MODULES = ("_oa", "_pairhmm", "_domaindef")


def _have_all():
    import importlib.util
    if not all(
            importlib.util.find_spec("witch_tpu.native." + m) is not None
            for m in _MODULES):
        return False
    # staleness: rebuild when any kernel source is newer than the
    # oldest .so (a stale ABI can otherwise raise TypeError at call
    # sites far from the import)
    try:
        import glob
        sos = glob.glob(os.path.join(_HERE, "*.so"))
        srcs = (glob.glob(os.path.join(_HERE, "*.cpp"))
                + glob.glob(os.path.join(_HERE, "*.h")))
        if sos and srcs:
            oldest_so = min(os.path.getmtime(p) for p in sos)
            newest_src = max(os.path.getmtime(p) for p in srcs)
            if newest_src > oldest_so:
                return False
    except OSError:
        pass
    return True


def _build_inplace():
    """Best-effort in-place build of the native extensions."""
    setup_py = os.path.join(_ROOT, "setup.py")
    if not os.path.exists(setup_py):
        return
    try:
        r = subprocess.run(
            [sys.executable, setup_py, "build_ext", "--inplace"],
            cwd=_ROOT, capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            sys.stderr.write(
                "witch_tpu.native: in-place build failed (rc=%d):\n%s\n"
                % (r.returncode, r.stderr[-2000:]))
    except Exception as e:  # pragma: no cover - environment-dependent
        sys.stderr.write("witch_tpu.native: in-place build error: %s\n" % e)


def _build_locked():
    """Run the build under an exclusive flock; losers wait, then return."""
    lock_path = os.path.join(_HERE, ".autobuild.lock")
    try:
        import fcntl
        with open(lock_path, "a+") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)  # blocks until winner finishes
            try:
                if not _have_all():
                    _build_inplace()
            finally:
                fcntl.flock(fh, fcntl.LOCK_UN)
    except ImportError:  # non-POSIX: no flock, accept the race
        _build_inplace()


if not _have_all() and not os.environ.get("WITCH_TPU_NO_AUTOBUILD"):
    _build_locked()
    importlib.invalidate_caches()


_trace_alphabet = None


def set_trace_alphabet(molecule: str) -> bool:
    """Enable _domaindef's exact-f32 stochastic-trace path by handing it
    this molecule's degeneracy/background tables (idempotent; returns
    False when the extension predates the feature or when disabled via
    WITCH_TPU_F32TRACE=0)."""
    global _trace_alphabet
    if _trace_alphabet == molecule:
        return True
    try:
        import numpy as np

        from ..core.alphabet import ALPHABETS
        from ..hmm.priors import get_background
        from . import _domaindef
        if not hasattr(_domaindef, "set_alphabet"):
            return False
        alpha = ALPHABETS[molecule]
        expand = np.ascontiguousarray(alpha._expand, np.float64)
        bg = np.ascontiguousarray(get_background(molecule), np.float64)
        ok = bool(_domaindef.set_alphabet(expand, bg))
        if ok:
            _trace_alphabet = molecule
            # best-effort exact-libm upgrade (oracle binary present)
            try:
                from . import icc_libm
                icc_libm.install(_domaindef)
            except Exception:
                pass
        return ok
    except Exception:
        return False
