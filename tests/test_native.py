"""Native trajlog codec: build, roundtrip, cross-compat with the Python path."""

import os

import pytest

from cartpoleplusplus_tpu.utils.native import (
    RecordWriter,
    native_available,
    read_records,
)

PAYLOADS = [b"", b"x", b"hello world", os.urandom(1 << 16), os.urandom(5 << 20)]


def _roundtrip(tmp_path, force_write_py, force_read_py):
    path = str(tmp_path / f"t_{force_write_py}_{force_read_py}.log")
    w = RecordWriter(path, force_python=force_write_py)
    for p in PAYLOADS:
        w.write(p)
    w.close()
    got = list(read_records(path, force_python=force_read_py))
    assert got == PAYLOADS


def test_python_roundtrip(tmp_path):
    _roundtrip(tmp_path, True, True)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_roundtrip(tmp_path):
    _roundtrip(tmp_path, False, False)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_cross_compat_wire_format(tmp_path):
    # Native writer ↔ Python reader and vice versa: identical wire format.
    _roundtrip(tmp_path, False, True)
    _roundtrip(tmp_path, True, False)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_append_reopen(tmp_path):
    path = str(tmp_path / "append.log")
    w = RecordWriter(path)
    w.write(b"one")
    w.close()
    w = RecordWriter(path)
    w.write(b"two")
    w.close()
    assert list(read_records(path)) == [b"one", b"two"]


def test_reader_rejects_garbage(tmp_path):
    path = str(tmp_path / "garbage.bin")
    with open(path, "wb") as f:
        f.write(b"notatrajlogfile")
    with pytest.raises(IOError):
        list(read_records(path, force_python=True))
