"""Vendored protobuf-runtime tests: wire-format correctness against
hand-computed proto3 encodings, plus the generated StateMessage_pb2
surface the TWS state protocol uses (the full protocol itself runs
end-to-end in tests/test_stateful_scd2.py::test_transform_with_state_counters)."""

from __future__ import annotations

import sys

import pytest


@pytest.fixture(scope="module")
def sm():
    pytest.importorskip(
        "pyspark.sql.streaming.proto", reason="pyspark without TWS proto"
    )
    from ida_dataengineerproject_spark.streaming.proto_shim import (
        _VENDOR_DIR,
        ensure_protobuf,
    )

    ensure_protobuf()
    assert _VENDOR_DIR in sys.path or "google.protobuf" in sys.modules
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_varint_and_signed64():
    from ida_dataengineerproject_spark.streaming.proto_shim import ensure_protobuf

    ensure_protobuf()
    from google.protobuf._wire import decode_varint, encode_varint, to_signed64

    for v in [0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1]:
        enc = encode_varint(v)
        dec, pos = decode_varint(enc, 0)
        assert (dec, pos) == (v, len(enc))
    # protobuf encodes negatives as 64-bit two's complement (10 bytes)
    enc = encode_varint(-1)
    assert len(enc) == 10
    dec, _ = decode_varint(enc, 0)
    assert to_signed64(dec) == -1
    # canonical known encoding: 300 -> AC 02
    assert encode_varint(300) == b"\xac\x02"


def test_known_wire_bytes(sm):
    # StateRequest{statefulProcessorCall{getValueState{stateName:"totals"}}}
    # field 2 LEN -> 0x12; StateCallCommand.stateName field 1 LEN -> 0x0a
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(stateName="totals")
        )
    )
    assert req.SerializeToString() == bytes.fromhex(
        "120a12080a06746f74616c73"
    )
    # proto3 scalar at default value is absent from the wire
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    # bool true -> field 4 varint 1 (ListStatePut.fetchWithArrow is f2)
    put = sm.ListStatePut(fetchWithArrow=True)
    assert put.SerializeToString() == b"\x10\x01"


def test_oneof_reassignment_clears_members(sm):
    call = sm.StatefulProcessorCall(setHandleState=sm.SetHandleState(state=sm.CREATED))
    assert call.WhichOneof("method") == "setHandleState"
    call.getValueState = sm.StateCallCommand(stateName="x")
    assert call.WhichOneof("method") == "getValueState"
    rt = sm.StatefulProcessorCall()
    rt.ParseFromString(call.SerializeToString())
    assert rt.getValueState.stateName == "x"
    assert not rt.HasField("setHandleState")


def test_vivified_empty_child_not_serialized(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "n"
    _ = cmd.ttl  # read-only touch must NOT mark ttl present
    assert cmd.SerializeToString() == b"\x0a\x01n"
    cmd.ttl.durationMs = 5000  # write-through vivification
    rt = sm.StateCallCommand()
    rt.ParseFromString(cmd.SerializeToString())
    assert rt.ttl.durationMs == 5000


def test_repeated_message_roundtrip(sm):
    resp = sm.StateResponseWithTimer(statusCode=0, requireNextFetch=True)
    resp.timer.append(sm.TimerInfo(key=b"k1", timestampMs=123))
    resp.timer.append(sm.TimerInfo(key=b"k2", timestampMs=-7))
    rt = sm.StateResponseWithTimer()
    rt.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in rt.timer] == [(b"k1", 123), (b"k2", -7)]
    assert rt.requireNextFetch is True


def test_unknown_fields_skipped(sm):
    # field 999 varint + a valid statusCode field: parser must skip the
    # unknown and read the known (forward-compat contract)
    unknown = b"\xb8\x3e\x2a"  # tag (999<<3)|0 = 7992 -> varint b8 3e, value 42
    known = b"\x08\x05"  # statusCode = 5
    msg = sm.StateResponse()
    msg.ParseFromString(unknown + known)
    assert msg.statusCode == 5


def test_real_protobuf_wins_when_installed():
    """ensure_protobuf must report shim-active only when no real
    distribution exists (here: none does, so it activates)."""
    from ida_dataengineerproject_spark.streaming.proto_shim import (
        _real_protobuf_installed,
        ensure_protobuf,
    )

    if _real_protobuf_installed():
        assert ensure_protobuf() is False
    else:
        assert ensure_protobuf() is True
        import google.protobuf

        assert "vendor" in google.protobuf.__file__
