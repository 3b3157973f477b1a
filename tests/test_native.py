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


def test_scan_records_native_and_python(tmp_path):
    """tl_scan indexes every record and both backends agree; read_record_at
    round-trips payloads by offset."""
    from cartpoleplusplus_tpu.utils.native import (
        RecordWriter, native_available, read_record_at, scan_records,
    )

    path = str(tmp_path / "scan.trjl")
    payloads = [b"", b"a", b"hello" * 100, bytes(range(256))]
    w = RecordWriter(path)
    for p in payloads:
        w.write(p)
    w.close()

    offs_py = scan_records(path, force_python=True)
    assert len(offs_py) == len(payloads)
    if native_available():
        assert scan_records(path) == offs_py
    for off, expect in zip(offs_py, payloads):
        assert read_record_at(path, off, force_python=True) == expect
        if native_available():
            assert read_record_at(path, off) == expect


def test_scan_records_detects_truncated_tail(tmp_path):
    """A crashed writer's partial record must fail the scan loudly in both
    backends (silent drop would hide data loss)."""
    import pytest

    from cartpoleplusplus_tpu.utils.native import (
        RecordWriter, native_available, scan_records,
    )

    path = str(tmp_path / "trunc.trjl")
    w = RecordWriter(path)
    w.write(b"complete record")
    w.close()
    with open(path, "ab") as f:
        import struct
        f.write(struct.pack("<I", 1000))  # header promising 1000 bytes...
        f.write(b"only a few")            # ...but a truncated payload

    with pytest.raises(IOError):
        scan_records(path, force_python=True)
    if native_available():
        with pytest.raises(IOError):
            scan_records(path)


def test_event_log_episode_selection(tmp_path):
    """--episode N selection decodes exactly one episode via the index."""
    import numpy as np

    from cartpoleplusplus_tpu.utils import event_log as el

    path = str(tmp_path / "ep.log")
    log = el.EventLog(path)
    for k in range(3):
        pose = np.full((7,), float(k), np.float32)
        evs = [
            el.make_event(pose, pose, [0.0, 0.0], 1.0, False)
            for _ in range(2 + k)
        ]
        log.add_episode(evs)
    log.close()

    offsets = el.index_event_log(path)
    assert len(offsets) == 3
    ep1 = el.read_episode_at(path, offsets[1])
    assert len(ep1.event) == 3
    assert abs(ep1.event[0].cart.position[0] - 1.0) < 1e-6
