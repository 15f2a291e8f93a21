"""Compile-on-demand loader for the _cdom C accelerator.

The extension is built from _cdom.c with the system C compiler the
first time the DOM is imported, cached next to the source
(dom/_build/, gitignored), and re-built whenever _cdom.c is newer
than the cached .so.  Everything degrades gracefully:

- no compiler / failed build / failed import  -> pure-Python DOM
- GO_HTMLDATE_NO_CDOM=1                       -> pure-Python DOM
- a parse the C tokenizer refuses (e.g. absurd tag names, lone
  surrogates)                                  -> per-document fallback

Concurrent builders (32 Spark python workers importing at once) each
compile to a unique temp file and os.replace() it into place, which is
atomic on POSIX — last writer wins, every loader sees a complete file.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os
import subprocess
import sys
import sysconfig
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_cdom.c")
_BUILD_DIR = os.path.join(_HERE, "_build")

_mod: object = None  # None = not tried, False = unavailable


def _so_path() -> str:
    suffix = importlib.machinery.EXTENSION_SUFFIXES[0]
    return os.path.join(_BUILD_DIR, f"_cdom{suffix}")


def _compile() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    include = sysconfig.get_paths()["include"]
    out = _so_path()
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_BUILD_DIR)
    os.close(fd)
    cc = os.environ.get("CC", "gcc")
    cmd = [cc, "-O2", "-fPIC", "-shared", f"-I{include}", _SRC, "-o", tmp]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


def _load() -> object:
    so = _so_path()
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
        so = _compile()
    # module name must match the PyInit__cdom export
    spec = importlib.util.spec_from_file_location("_cdom", so)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def get() -> object | None:
    """The configured _cdom module, or None when unavailable."""
    global _mod
    if _mod is False:
        return None
    if _mod is None:
        if os.environ.get("GO_HTMLDATE_NO_CDOM"):
            _mod = False
            return None
        try:
            _mod = _load()
        except Exception:
            _mod = False
            return None
    return _mod or None
