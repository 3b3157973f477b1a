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
    lib.tl_scan.restype = ctypes.c_int64
    lib.tl_scan.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
    ]
    lib.tl_read_at.restype = ctypes.c_int64
    lib.tl_read_at.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64,
    ]
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
                if len(header) < 4:
                    # Writer died mid-header: surface the same IOError the
                    # native reader maps its -4 to, not a struct.error.
                    raise IOError("truncated record")
                (n,) = _U32.unpack(header)
                data = f.read(n)
                if len(data) < n:
                    raise IOError("truncated record")
                yield data


def scan_records(path: str, force_python: bool = False) -> list[int]:
    """Index the log in one pass → byte offset of every record header.

    Validates the framing end-to-end: raises IOError on a truncated tail
    (e.g. a crashed writer mid-record) instead of silently dropping it.
    Powers O(1) random access (``read_record_at``) for the event-log CLI's
    --episode selection — the native scan touches only the headers.
    """
    lib = None if force_python else _load_lib()
    if lib is not None:
        count = lib.tl_scan(path.encode(), None, 0)
        if count < 0:
            raise IOError(f"tl_scan rc={count} for {path!r}")
        arr = (ctypes.c_uint64 * max(int(count), 1))()
        got = lib.tl_scan(path.encode(), arr, count)
        if got != count:
            raise IOError(f"tl_scan changed underfoot: {got} != {count}")
        return [int(arr[i]) for i in range(int(count))]
    offsets = []
    with open(path, "rb") as f:
        magic = f.read(4)
        if len(magic) < 4 or _U32.unpack(magic)[0] != _MAGIC:
            raise IOError(f"not a trajlog file: {path!r}")
        f.seek(0, os.SEEK_END)
        size = f.tell()
        off = 4
        while off < size:
            if size - off < 4:
                raise IOError("truncated record header")
            f.seek(off)
            (n,) = _U32.unpack(f.read(4))
            if size - off - 4 < n:
                raise IOError("truncated record payload")
            offsets.append(off)
            off += 4 + n
    return offsets


def read_record_at(path: str, offset: int, force_python: bool = False) -> bytes:
    """Read the single record whose header starts at ``offset`` (from
    :func:`scan_records`)."""
    lib = None if force_python else _load_lib()
    if lib is not None:
        n = lib.tl_read_at(path.encode(), offset, None, 0)
        if n < 0:
            raise IOError(f"tl_read_at rc={n}")
        buf = ctypes.create_string_buffer(max(int(n), 1))
        got = lib.tl_read_at(path.encode(), offset, buf, n)
        if got != n:
            raise IOError(f"tl_read_at rc={got}")
        return buf.raw[: int(n)]
    with open(path, "rb") as f:
        f.seek(offset)
        (n,) = _U32.unpack(f.read(4))
        data = f.read(n)
        if len(data) < n:
            raise IOError("truncated record")
        return data
