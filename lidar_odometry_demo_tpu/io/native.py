"""ctypes bindings for the native IO runtime (native/lidar_native.cpp).

Builds the shared library on first use if a toolchain is available;
callers fall back to the pure-NumPy readers in io/pcd.py otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liblidar_native.so"))

_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ln_pcd_num_points.restype = ctypes.c_long
    lib.ln_pcd_num_points.argtypes = [ctypes.c_char_p]
    lib.ln_pcd_read.restype = ctypes.c_long
    lib.ln_pcd_read.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
    ]
    lib.ln_vlp16_decode.restype = ctypes.c_long
    lib.ln_vlp16_decode.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_pcd_fields(path: str, fields: list[str]) -> dict[str, np.ndarray] | None:
    """Read named fields as float32 columns via the native parser.

    Returns None if the native library is unavailable (caller falls back).
    """
    lib = _load()
    if lib is None:
        return None
    n = lib.ln_pcd_num_points(path.encode())
    if n <= 0:
        raise IOError(f"native PCD parse failed for {path}")
    buf = np.zeros((len(fields), n), np.float32)
    got = lib.ln_pcd_read(
        path.encode(), ";".join(fields).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    if got < 0:
        raise IOError(f"native PCD read failed for {path}")
    return {f: buf[i, :got].copy() for i, f in enumerate(fields)}


def decode_vlp16_packets(packets: bytes, capacity: int = 1 << 20):
    """Decode raw VLP16 1206-byte data packets to XYZIRT arrays."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if len(packets) % 1206 != 0:
        raise ValueError("packet buffer must be a multiple of 1206 bytes")
    num = len(packets) // 1206
    raw = np.frombuffer(packets, np.uint8)
    xyz = np.zeros((capacity, 3), np.float32)
    inten = np.zeros(capacity, np.float32)
    ring = np.zeros(capacity, np.float32)
    time = np.zeros(capacity, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    n = lib.ln_vlp16_decode(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), num,
        xyz.ctypes.data_as(fp), inten.ctypes.data_as(fp),
        ring.ctypes.data_as(fp), time.ctypes.data_as(fp), capacity,
    )
    return (
        xyz[:n], inten[:n], ring[:n].astype(np.int32), time[:n],
    )
