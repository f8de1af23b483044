"""ctypes bindings for the native batch image loader (native/pnm_loader.cpp).

Builds the shared library on first use (g++, cached under native/build) and
falls back transparently to the pure-numpy decoder (sfm_tpu.io.images) if the
toolchain or the .so is unavailable — the framework never hard-requires the
native layer, it just gets faster with it.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "build" / "libpnm.so"
_LIB = None
_TRIED = False


def _build() -> Optional[Path]:
    src = _NATIVE_DIR / "pnm_loader.cpp"
    if not src.exists():
        return None
    _SO_PATH.parent.mkdir(parents=True, exist_ok=True)
    if _SO_PATH.exists() and _SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return _SO_PATH
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_SO_PATH), str(src), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO_PATH
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native loader build failed (%s); using numpy fallback", e)
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.pnm_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.pnm_probe.restype = ctypes.c_int
    lib.pnm_load_gray_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.pnm_load_gray_batch.restype = ctypes.c_int
    lib.pnm_load_mask_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.pnm_load_mask_batch.restype = ctypes.c_int
    lib.pnm_load_gray_u8_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.pnm_load_gray_u8_batch.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def probe(path) -> tuple[int, int, int]:
    """(height, width, channels) of a PNM file via the native parser."""
    lib = get_lib()
    if lib is None:
        from sfm_tpu.io.images import load_image

        img = load_image(path)
        return img.shape[0], img.shape[1], 1 if img.ndim == 2 else img.shape[2]
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.pnm_probe(str(path).encode(), h, w, c)
    if rc != 0:
        raise ValueError(f"pnm_probe failed ({rc}) for {path}")
    return h.value, w.value, c.value


def load_gray_batch(paths: Sequence, height: int, width: int, threads: int = 0) -> np.ndarray:
    """Decode a batch of PNM images to (N, H, W) float32 gray in [0, 1]."""
    paths = [str(p) for p in paths]
    lib = get_lib()
    if lib is None:
        from sfm_tpu.io.images import load_image_gray

        return np.stack([load_image_gray(p) for p in paths])
    out = np.empty((len(paths), height, width), np.float32)
    blob = "\n".join(paths).encode()
    fails = lib.pnm_load_gray_batch(
        blob, len(paths), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
    )
    if fails:
        raise ValueError(f"{fails} images failed to decode")
    return out


def load_gray_u8_batch(paths: Sequence, height: int, width: int,
                       threads: int = 0) -> np.ndarray:
    """Decode a batch of PNM images to (N, H, W) uint8 luma — the detection
    frontend's wire format (normalized on device)."""
    paths = [str(p) for p in paths]
    lib = get_lib()
    if lib is None:
        from sfm_tpu.io.images import load_image_gray_u8

        return np.stack([load_image_gray_u8(p) for p in paths])
    out = np.empty((len(paths), height, width), np.uint8)
    blob = "\n".join(paths).encode()
    fails = lib.pnm_load_gray_u8_batch(
        blob, len(paths), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads,
    )
    if fails:
        raise ValueError(f"{fails} images failed to decode")
    return out


def load_mask_batch(paths: Sequence, height: int, width: int, threads: int = 0) -> np.ndarray:
    """Decode silhouette masks to (N, H, W) bool (True = foreground).

    Reference semantics (find_matches.py:49-72): threshold 127, invert, 3x3
    morphological close.
    """
    paths = [str(p) for p in paths]
    lib = get_lib()
    if lib is None:
        from sfm_tpu.io.images import load_mask

        return np.stack([load_mask(p) for p in paths])
    out = np.empty((len(paths), height, width), np.uint8)
    blob = "\n".join(paths).encode()
    fails = lib.pnm_load_mask_batch(
        blob, len(paths), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads,
    )
    if fails:
        raise ValueError(f"{fails} masks failed to decode")
    return out.astype(bool)
