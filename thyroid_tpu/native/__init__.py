"""Native (C++) host-side decode loader — build + ctypes binding.

Builds loader.cc into a cached shared library on first use (g++ + libpng +
zlib) and exposes a GIL-free threaded batch decoder. Falls back gracefully:
callers should treat `load_native() is None` as "use the Python decode path".
"""
from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)

_SRC = Path(__file__).with_name("loader.cc")
_BUILD_DIR = Path(__file__).with_name("_build")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> Path:
    tag = hashlib.sha1(_SRC.read_bytes()).hexdigest()[:12]
    return _BUILD_DIR / f"libthyroid_loader_{tag}.so"


def build_native(force: bool = False) -> Optional[Path]:
    """Compile loader.cc → .so (content-hashed cache). None on failure."""
    out = _lib_path()
    if out.exists() and not force:
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(out), "-lpng", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        logger.info("native loader build failed (%s); using Python decode",
                    str(detail)[:300])
        return None
    return out


def load_native() -> Optional[ctypes.CDLL]:
    """The bound library, building on first call; None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.image_size.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
    lib.image_size.restype = ctypes.c_int
    lib.decode_image_u16.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_int, ctypes.c_int]
    lib.decode_image_u16.restype = ctypes.c_int
    lib.decode_batch_u16.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                     ctypes.c_int, ctypes.c_void_p,
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.decode_batch_u16.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_supported(path: str | Path) -> bool:
    # .tif/.tiff: classic uncompressed TIFF decodes natively; exotic
    # variants return a nonzero rc and decode_batch_native falls back to
    # the Python tifffile/PIL chain
    return str(path).lower().endswith((".png", ".pgm", ".tif", ".tiff"))


def decode_batch_native(
    paths: List[str | Path], num_threads: int = 0
) -> Optional[np.ndarray]:
    """Decode a homogeneous batch → (N, H, W, 1) uint16, or None when the
    native path can't serve it (build failure, unsupported format, mixed
    shapes)."""
    lib = load_native()
    if lib is None or not paths or not all(native_supported(p) for p in paths):
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.image_size(str(paths[0]).encode(), ctypes.byref(h),
                      ctypes.byref(w)) != 0:
        return None
    out = np.empty((len(paths), h.value, w.value), dtype=np.uint16)
    arr = (ctypes.c_char_p * len(paths))(*[str(p).encode() for p in paths])
    rc = lib.decode_batch_u16(arr, len(paths),
                              out.ctypes.data_as(ctypes.c_void_p),
                              h.value, w.value, num_threads)
    if rc != 0:
        logger.info("native batch decode returned %d; using Python decode", rc)
        return None
    return out[..., None]
