"""ctypes bindings for the native IO runtime (native/trajlog.cpp).

The reference's trajectory logs serialize through protobuf's C++ backend;
the rebuild's analogue is a small C++ record-log library (buffered
length-prefixed framing) compiled on demand with the system toolchain and
bound here via ctypes (no pybind11 in this image).  Everything degrades to a
pure-Python implementation with the identical wire format when a compiler is
unavailable, so the package never hard-depends on the .so.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterator, Optional

_MAGIC = 0x54524A4C
_U32 = struct.Struct("<I")

_native_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) libtrajlog.so; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so = os.path.join(_native_dir, "libtrajlog.so")
    src = os.path.join(_native_dir, "trajlog.cpp")
    try:
        if (not os.path.exists(so) or
                os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["make", "-s", "-C", _native_dir],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(so)
    except Exception:
        return None
    lib.tl_open.restype = ctypes.c_void_p
    lib.tl_open.argtypes = [ctypes.c_char_p]
    lib.tl_write.restype = ctypes.c_int
    lib.tl_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
    lib.tl_flush.restype = ctypes.c_int
    lib.tl_flush.argtypes = [ctypes.c_void_p]
    lib.tl_close.argtypes = [ctypes.c_void_p]
    lib.tl_reader_open.restype = ctypes.c_void_p
    lib.tl_reader_open.argtypes = [ctypes.c_char_p]
    lib.tl_next_len.restype = ctypes.c_int64
    lib.tl_next_len.argtypes = [ctypes.c_void_p]
    lib.tl_read.restype = ctypes.c_int64
    lib.tl_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
    lib.tl_reader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


class RecordWriter:
    """Append-only length-prefixed record log (native when possible)."""

    def __init__(self, path: str, force_python: bool = False):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._lib = None if force_python else _load_lib()
        if self._lib is not None:
            self._h = self._lib.tl_open(path.encode())
            if not self._h:
                raise IOError(f"tl_open failed for {path!r}")
        else:
            self._f = open(path, "ab")
            if self._f.tell() == 0:
                self._f.write(_U32.pack(_MAGIC))

    def write(self, payload: bytes) -> None:
        if self._lib is not None:
            rc = self._lib.tl_write(self._h, payload, len(payload))
            if rc != 0:
                raise IOError(f"tl_write rc={rc}")
        else:
            self._f.write(_U32.pack(len(payload)))
            self._f.write(payload)

    def flush(self) -> None:
        if self._lib is not None:
            self._lib.tl_flush(self._h)
        else:
            self._f.flush()

    def close(self) -> None:
        if self._lib is not None:
            if self._h:
                self._lib.tl_close(self._h)
                self._h = None
        else:
            self._f.close()


def read_records(path: str, force_python: bool = False) -> Iterator[bytes]:
    """Stream records back (native reader when possible)."""
    lib = None if force_python else _load_lib()
    if lib is not None:
        h = lib.tl_reader_open(path.encode())
        if not h:
            raise IOError(f"not a trajlog file: {path!r}")
        try:
            while True:
                n = lib.tl_next_len(h)
                if n == -9:  # clean EOF
                    return
                if n < 0:
                    raise IOError(f"tl_next_len rc={n}")
                buf = ctypes.create_string_buffer(max(int(n), 1))
                got = lib.tl_read(h, buf, max(int(n), 1))
                if got != n:
                    raise IOError(f"tl_read rc={got}")
                yield buf.raw[: int(n)]
        finally:
            lib.tl_reader_close(h)
    else:
        with open(path, "rb") as f:
            magic = f.read(4)
            if len(magic) < 4 or _U32.unpack(magic)[0] != _MAGIC:
                raise IOError(f"not a trajlog file: {path!r}")
            while True:
                header = f.read(4)
                if not header:
                    return
                (n,) = _U32.unpack(header)
                data = f.read(n)
                if len(data) < n:
                    raise IOError("truncated record")
                yield data
