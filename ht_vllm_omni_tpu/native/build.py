"""Build helper for the native C++ pieces.

Compiles ``transfer_engine.cpp`` into a cached shared library with g++
(-O3, C++17) the first time it is needed; subsequent imports reuse the
cache keyed by a source hash.  No pybind11 — the library exposes a plain
C ABI loaded via ctypes (native/transfer.py).
"""

from __future__ import annotations

import hashlib
import logging
import os
import pathlib
import shutil
import subprocess
import tempfile
import threading

logger = logging.getLogger(__name__)

_SRC_DIR = pathlib.Path(__file__).resolve().parent
_LOCK = threading.Lock()


def _cache_dir() -> pathlib.Path:
    root = os.environ.get("HT_OMNI_NATIVE_CACHE")
    if root:
        return pathlib.Path(root)
    return pathlib.Path(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    ) / "ht_vllm_omni_tpu"


def build_library(name: str, source: str) -> pathlib.Path | None:
    """Compile ``native/<source>`` -> cached ``lib<name>-<hash>.so``.

    Returns None (with a log line) when no C++ toolchain is available,
    letting callers fall back to the pure-Python path.
    """
    src = _SRC_DIR / source
    digest = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    out = _cache_dir() / f"lib{name}-{digest}.so"
    if out.exists():
        return out
    gxx = shutil.which("g++") or shutil.which("c++") or shutil.which("clang++")
    if gxx is None:
        logger.warning("no C++ compiler found; %s unavailable", name)
        return None
    with _LOCK:
        if out.exists():
            return out
        out.parent.mkdir(parents=True, exist_ok=True)
        # build into a temp file then rename: concurrent processes race
        # benignly (both produce identical bits)
        with tempfile.NamedTemporaryFile(
            dir=out.parent, suffix=".so", delete=False
        ) as tmp:
            tmp_path = pathlib.Path(tmp.name)
        cmd = [
            gxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            "-Wall", str(src), "-o", str(tmp_path),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:  # pragma: no cover
            tmp_path.unlink(missing_ok=True)
            logger.error("native build failed: %s\n%s", cmd, e.stderr)
            return None
        tmp_path.replace(out)
        logger.info("built %s", out)
    return out
