"""Shared build-and-load machinery for the native entropy backends.

Both native libraries (``native/rlgr.cpp``, ``native/geom.cpp``) follow
the same lifecycle: build the shared object with g++ on first use (or
when the source is newer than the binary — a fresh checkout or an edit),
load it through ctypes, and configure the C-API signatures. Keeping the
loader here means mtime/rebuild/warning behavior cannot drift between
the backends.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Callable, Optional


class NativeLib:
    """Lazy builder/loader for one g++-compiled shared library."""

    def __init__(self, src: str, lib: str,
                 configure: Callable[[ctypes.CDLL], None],
                 extra_flags: tuple = (), deps: tuple = ()):
        self._src = src
        self._lib_path = lib
        self._configure = configure
        self._extra_flags = tuple(extra_flags)
        # extra source dependencies (headers): an edit to any of them
        # must trigger a rebuild just like an edit to the main source
        self._deps = tuple(deps)
        self._lib: Optional[ctypes.CDLL] = None
        self._tried_build = False

    def _build(self) -> Optional[str]:
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared",
            "-fPIC", *self._extra_flags, self._src, "-o", self._lib_path,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return self._lib_path
        except Exception as e:  # pragma: no cover - toolchain missing
            warnings.warn(
                f"could not build {os.path.basename(self._lib_path)}: {e}"
            )
            return None

    def load(self) -> Optional[ctypes.CDLL]:
        if self._lib is not None:
            return self._lib
        if not os.path.exists(self._lib_path) or any(
            os.path.exists(s)
            and os.path.getmtime(s) > os.path.getmtime(self._lib_path)
            for s in (self._src, *self._deps)
        ):
            if self._tried_build:
                return None
            self._tried_build = True
            if self._build() is None:
                return None
        try:
            lib = ctypes.CDLL(self._lib_path)
        except OSError as e:  # pragma: no cover
            warnings.warn(
                f"could not load {os.path.basename(self._lib_path)}: {e}"
            )
            return None
        self._configure(lib)
        self._lib = lib
        return self._lib
