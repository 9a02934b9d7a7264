"""TensorBoard event writer (segtpu/core/tboard.py): CRC-32C known-answer
vectors, own-reader round trip, cross-validation against tensorboard's own
proto parser when importable, corruption detection, and the train_model
``tensorboard_dir`` integration (covered in tests/test_ema.py to reuse its
training run)."""

import struct

import numpy as np
import pytest

from segtpu.core.tboard import (TBWriter, crc32c, frame_record,
                                encode_scalar_event, read_scalar_events)

try:
    from tensorboard.compat.proto import event_pb2
    HAVE_TB = True
except Exception:  # pragma: no cover - tensorboard optional
    HAVE_TB = False


def test_crc32c_known_answers():
    # RFC 3720 / kernel test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(bytes(range(32))) == 0x46DD794E


def test_roundtrip_own_reader(tmp_path):
    d = str(tmp_path / "run")
    with TBWriter(d) as tb:
        tb.add_scalar("val/iou", 0.75, step=0)
        tb.add_scalars({"train/loss": 1.5, "val/loss": 2.25}, step=1,
                       wall_time=123.5)
        tb.add_scalar("neg", -3.0, step=-2)   # negative step int64 varint
    events = list(read_scalar_events(tb.path))
    assert len(events) == 3
    wt0, step0, s0 = events[0]
    assert step0 == 0 and s0 == {"val/iou": np.float32(0.75)}
    wt1, step1, s1 = events[1]
    assert (wt1, step1) == (123.5, 1)
    assert s1 == {"train/loss": 1.5, "val/loss": 2.25}
    assert events[2][1] == -2 and events[2][2]["neg"] == -3.0


def test_empty_scalars_writes_nothing(tmp_path):
    with TBWriter(str(tmp_path)) as tb:
        tb.add_scalars({}, step=0)
        path = tb.path
    assert list(read_scalar_events(path)) == []


def test_closed_writer_raises(tmp_path):
    tb = TBWriter(str(tmp_path))
    tb.close()
    with pytest.raises(ValueError, match="closed"):
        tb.add_scalar("x", 1.0, 0)


def test_corruption_detected_in_non_tail_record(tmp_path):
    with TBWriter(str(tmp_path)) as tb:
        tb.add_scalar("a", 1.0, 0)
        tb.add_scalar("b", 2.0, 1)
        path = tb.path
    blob = bytearray(open(path, "rb").read())
    # flip a byte inside the FIRST record's payload (the file_version
    # event, offset 12 is its first data byte) — mid-file corruption must
    # still be a hard error, not silently skipped
    blob[12] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="crc"):
        list(read_scalar_events(path))


def test_torn_tail_truncation_yields_prefix(tmp_path):
    """A process killed mid-write leaves a partial final record; every
    COMPLETE earlier event must stay readable (writer's crash-visible
    contract), with a warning instead of a hard error."""
    with TBWriter(str(tmp_path)) as tb:
        tb.add_scalar("a", 1.0, 0)
        tb.add_scalar("b", 2.0, 1)
        path = tb.path
    blob = open(path, "rb").read()
    open(path, "wb").write(blob[:-5])  # cut into the last record
    with pytest.warns(RuntimeWarning, match="torn tail"):
        events = list(read_scalar_events(path))
    assert len(events) == 1
    assert events[0][2] == {"a": 1.0}


def test_torn_tail_crc_failure_yields_prefix(tmp_path):
    """A complete-looking final record with a failing CRC (torn write of
    the trailing CRC field) also terminates iteration after the prefix."""
    with TBWriter(str(tmp_path)) as tb:
        tb.add_scalar("a", 1.0, 0)
        tb.add_scalar("b", 2.0, 1)
        path = tb.path
    blob = bytearray(open(path, "rb").read())
    blob[-6] ^= 0xFF  # flip a byte inside the LAST record's payload
    open(path, "wb").write(bytes(blob))
    with pytest.warns(RuntimeWarning, match="torn tail"):
        events = list(read_scalar_events(path))
    assert len(events) == 1
    assert events[0][2] == {"a": 1.0}


@pytest.mark.skipif(not HAVE_TB, reason="tensorboard not importable")
def test_proto_bytes_parse_with_tensorboard():
    """The hand-encoded Event must decode byte-exactly with tensorboard's
    own generated protobuf classes."""
    data = encode_scalar_event(42.5, 7, {"val/iou": 0.625, "lr": 0.001})
    ev = event_pb2.Event.FromString(data)
    assert ev.wall_time == 42.5
    assert ev.step == 7
    vals = {v.tag: v.simple_value for v in ev.summary.value}
    assert vals["val/iou"] == np.float32(0.625)
    assert vals["lr"] == np.float32(0.001)


@pytest.mark.skipif(not HAVE_TB, reason="tensorboard not importable")
def test_event_file_loads_with_tensorboard_loader(tmp_path):
    """Full-file check through tensorboard's event_file_loader — what
    `tensorboard --logdir` actually runs."""
    try:
        from tensorboard.backend.event_processing import event_file_loader
    except Exception:
        pytest.skip("event_file_loader not importable")
    with TBWriter(str(tmp_path)) as tb:
        for e in range(3):
            tb.add_scalars({"val/iou": 0.5 + 0.1 * e}, step=e)
        path = tb.path
    loader = event_file_loader.LegacyEventFileLoader(path)
    events = list(loader.Load())
    assert events[0].file_version == "brain.Event:2"
    scalar_events = [e for e in events if len(e.summary.value)]
    assert [e.step for e in scalar_events] == [0, 1, 2]
    assert scalar_events[2].summary.value[0].simple_value == \
        pytest.approx(0.7, abs=1e-6)


def test_frame_record_layout():
    data = b"hello"
    rec = frame_record(data)
    (length,) = struct.unpack("<Q", rec[:8])
    assert length == 5
    assert rec[12:17] == data
    assert len(rec) == 8 + 4 + 5 + 4
