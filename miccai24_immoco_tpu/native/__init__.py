"""ctypes bindings for the native host data-plane (immoco_native.cpp).

Builds the shared library on demand with g++ (cached next to the source);
every entry point has a pure-numpy fallback so the framework degrades
gracefully on machines without a toolchain.  ``available()`` reports which
path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "immoco_native.cpp")
_LIB = os.path.join(_DIR, "libimmoco_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        lib.rss_combine_crop.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.run_length_groups.restype = ctypes.c_int
        lib.run_length_groups.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ugly_number.restype = ctypes.c_long
        lib.ugly_number.argtypes = [ctypes.c_long]
        lib.kb_table.argtypes = [
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.pack_write.restype = ctypes.c_int
        lib.pack_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.pack_read_header.restype = ctypes.c_int64
        lib.pack_read_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pack_read_slices.restype = ctypes.c_int
        lib.pack_read_slices.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rss_combine_crop(slice_complex: np.ndarray, crop: int) -> np.ndarray:
    """(coils, H, W) complex64 -> (crop, crop) complex64, separate-Re/Im RSS."""
    lib = _load()
    coils, h, w = slice_complex.shape
    re = np.ascontiguousarray(slice_complex.real, np.float32)
    im = np.ascontiguousarray(slice_complex.imag, np.float32)
    if lib is None:
        cy, cx = h // 2 - crop // 2, w // 2 - crop // 2
        re_c = re[:, cy : cy + crop, cx : cx + crop]
        im_c = im[:, cy : cy + crop, cx : cx + crop]
        return (
            np.sqrt((re_c**2).sum(0)) + 1j * np.sqrt((im_c**2).sum(0))
        ).astype(np.complex64)
    out_re = np.empty((crop, crop), np.float32)
    out_im = np.empty((crop, crop), np.float32)
    lib.rss_combine_crop(
        _fptr(re), _fptr(im), coils, h, w, crop, _fptr(out_re), _fptr(out_im)
    )
    return (out_re + 1j * out_im).astype(np.complex64)


def run_length_groups(indicators: np.ndarray) -> Tuple[np.ndarray, int]:
    """(W,) 0/1 -> ((W,) int32 group ids, n_groups)."""
    lib = _load()
    ind = np.ascontiguousarray(indicators.astype(np.uint8))
    if lib is None:
        out = np.zeros(ind.shape[0], np.int32)
        count, prev = 0, 0
        for i, v in enumerate(ind):
            if v:
                if not prev:
                    count += 1
                out[i] = count
            prev = v
        return out, count
    out = np.empty(ind.shape[0], np.int32)
    n = lib.run_length_groups(
        ind.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ind.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, int(n)


def ugly_number(n: int) -> int:
    lib = _load()
    if lib is None:
        from miccai24_immoco_tpu.ops.nufft import ugly_number as py_ugly

        return py_ugly(n)
    return int(lib.ugly_number(int(np.ceil(n))))


def kb_table(n: int, width: float, beta: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        x = np.arange(n) / n
        return (np.i0(beta * np.sqrt(1 - x**2)) / width).astype(np.float32)
    out = np.empty(n, np.float32)
    lib.kb_table(n, width, beta, _fptr(out))
    return out


class PackFile:
    """Binary corpus with O(1) random slice access (complex stored as 2ch)."""

    @staticmethod
    def write(path: str, slices: np.ndarray) -> None:
        """slices: (N, H, W) complex64 or (N, H, W, C) float32."""
        if np.iscomplexobj(slices):
            data = np.stack([slices.real, slices.imag], -1).astype(np.float32)
        else:
            data = np.asarray(slices, np.float32)
            if data.ndim == 3:
                data = data[..., None]
        n, h, w, c = data.shape
        data = np.ascontiguousarray(data)
        lib = _load()
        if lib is None:
            hdr = np.zeros(1, dtype=_HDR_DTYPE)
            hdr["magic"] = np.frombuffer(b"IMCO", np.uint8)
            hdr["version"] = 1
            hdr["n"], hdr["h"], hdr["w"], hdr["c"] = n, h, w, c
            with open(path, "wb") as f:
                hdr.tofile(f)
                data.tofile(f)
            return
        rc = lib.pack_write(path.encode(), _fptr(data), n, h, w, c)
        if rc != 0:
            raise IOError(f"pack_write failed: {rc}")

    def __init__(self, path: str):
        self.path = path
        lib = _load()
        if lib is None:
            hdr = np.fromfile(path, dtype=_HDR_DTYPE, count=1)[0]
            assert bytes(hdr["magic"]) == b"IMCO", "bad packfile"
            self.n, self.h, self.w, self.c = (
                int(hdr["n"]), int(hdr["h"]), int(hdr["w"]), int(hdr["c"])
            )
        else:
            h = ctypes.c_int32()
            w = ctypes.c_int32()
            c = ctypes.c_int32()
            n = lib.pack_read_header(
                path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)
            )
            if n < 0:
                raise IOError(f"pack_read_header failed: {n}")
            self.n, self.h, self.w, self.c = int(n), h.value, w.value, c.value

    def read(self, idx: int, count: int = 1) -> np.ndarray:
        lib = _load()
        if lib is None:
            offset = _HDR_DTYPE.itemsize + idx * self.h * self.w * self.c * 4
            data = np.fromfile(
                self.path, np.float32, count * self.h * self.w * self.c, offset=offset
            )
        else:
            data = np.empty(count * self.h * self.w * self.c, np.float32)
            rc = lib.pack_read_slices(self.path.encode(), idx, count, _fptr(data))
            if rc != 0:
                raise IOError(f"pack_read_slices failed: {rc}")
        out = data.reshape(count, self.h, self.w, self.c)
        if self.c == 2:
            return (out[..., 0] + 1j * out[..., 1]).astype(np.complex64)
        return out

    def read_complex(self, idx: int, count: int = 1) -> np.ndarray:
        return self.read(idx, count)


# Matches PackHeader in immoco_native.cpp under x86-64 natural alignment:
# magic(4) version(4) n(8 @offset 8) h/w/c(4 each @16/20/24) = 28 bytes of
# fields, padded to sizeof == 32 by the struct's int64 alignment (verified
# against g++; tests/test_native.py round-trips the layout).
_HDR_DTYPE = np.dtype(
    {
        "names": ["magic", "version", "n", "h", "w", "c"],
        "formats": [(np.uint8, 4), np.uint32, np.int64, np.int32, np.int32, np.int32],
        "offsets": [0, 4, 8, 16, 20, 24],
        "itemsize": 32,
    }
)
