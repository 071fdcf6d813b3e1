"""Native (C) components, built lazily with the system toolchain.

Each module's C sources compile once into a shared library cached under
``<repo>/cm3d_tpu/native/_build`` keyed by a source hash; bindings go
through ctypes (no pybind11 in this image). A pure-numpy fallback exists for
every native entry point, so the framework degrades gracefully on machines
without a C compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

_BUILD_DIR = Path(__file__).parent / "_build"


def _ensure_build_dir() -> Optional[Path]:
    """Writable cache dir for compiled artifacts, or None (fallbacks only).

    Non-editable installs can land in a read-only site-packages; fall back
    to a per-user temp dir there so the native path still works, and to
    None (pure-numpy fallbacks) if even that is unwritable. The temp dir
    lives in a world-shared /tmp under a predictable name, so it is only
    trusted when it is OURS and private (0700, owner uid) — a pre-created
    attacker-owned dir would otherwise let a hostile local user plant a
    cached .so that ctypes.CDLL loads."""
    try:
        _BUILD_DIR.mkdir(exist_ok=True)
        if os.access(_BUILD_DIR, os.W_OK):
            return _BUILD_DIR
    except OSError:
        pass
    import stat
    import tempfile

    alt = Path(tempfile.gettempdir()) / f"cm3d_native_build_{os.getuid()}"
    try:
        alt.mkdir(mode=0o700, exist_ok=True)
        st = os.lstat(alt)
        if (
            stat.S_ISDIR(st.st_mode)
            and st.st_uid == os.getuid()
            and not (st.st_mode & 0o077)
            and os.access(alt, os.W_OK)
        ):
            return alt
        return None
    except OSError:
        return None


def build_binary(
    source_names: list[str], bin_stem: str, extra_flags: Optional[list[str]] = None
) -> Optional[Path]:
    """Compile C/C++ sources into a cached executable; None on failure."""
    src_dir = Path(__file__).parent
    sources = [src_dir / s for s in source_names]
    h = hashlib.sha256()
    for s in sources:
        h.update(s.read_bytes())
    for f in extra_flags or []:
        h.update(f.encode())
    tag = h.hexdigest()[:16]
    build_dir = _ensure_build_dir()
    if build_dir is None:
        return None
    bin_path = build_dir / f"{bin_stem}-{tag}"
    if not bin_path.exists():
        cxx = os.environ.get("CXX", "g++")
        cmd = [cxx, "-O2", "-std=c++17"] + (extra_flags or []) + [
            "-o", str(bin_path)
        ] + [str(s) for s in sources]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, OSError):
            return None
    return bin_path


def build_shared_lib(source_names: list[str], lib_stem: str) -> Optional[ctypes.CDLL]:
    """Compile C sources from this directory into a cached .so; None on failure."""
    src_dir = Path(__file__).parent
    sources = [src_dir / s for s in source_names]
    h = hashlib.sha256()
    for s in sources:
        h.update(s.read_bytes())
    tag = h.hexdigest()[:16]
    build_dir = _ensure_build_dir()
    if build_dir is None:
        return None
    lib_path = build_dir / f"{lib_stem}-{tag}.so"
    if not lib_path.exists():
        is_cxx = any(s.suffix in (".cc", ".cpp") for s in sources)
        cc = os.environ.get("CXX", "g++") if is_cxx else os.environ.get("CC", "cc")
        cmd = [cc, "-O3"] + (["-std=c++17"] if is_cxx else []) + [
            "-shared", "-fPIC", "-o", str(lib_path)
        ] + [str(s) for s in sources]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, OSError):
            return None
    try:
        return ctypes.CDLL(str(lib_path))
    except OSError:
        return None
