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
    bin_path = _BUILD_DIR / f"{bin_stem}-{tag}"
    if not bin_path.exists():
        _BUILD_DIR.mkdir(exist_ok=True)
        cxx = os.environ.get("CXX", "g++")
        cmd = [cxx, "-O2", "-std=c++17"] + (extra_flags or []) + [
            "-o", str(bin_path)
        ] + [str(s) for s in sources]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
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
    lib_path = _BUILD_DIR / f"{lib_stem}-{tag}.so"
    if not lib_path.exists():
        _BUILD_DIR.mkdir(exist_ok=True)
        is_cxx = any(s.suffix in (".cc", ".cpp") for s in sources)
        cc = os.environ.get("CXX", "g++") if is_cxx else os.environ.get("CC", "cc")
        cmd = [cc, "-O3"] + (["-std=c++17"] if is_cxx else []) + [
            "-shared", "-fPIC", "-o", str(lib_path)
        ] + [str(s) for s in sources]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        return ctypes.CDLL(str(lib_path))
    except OSError:
        return None
