"""Wire-format tests for the pure-stdlib protobuf shim
(streaming/proto_shim.py): encode bytes are checked against hand-rolled
protobuf wire format (the public spec), parse against synthetic server
responses, and the descriptor parser against the installed pyspark's
embedded FileDescriptorProto. The true end-to-end check is
test_unify_tws.py's e2e test, which drives a real transformWithState
query through the shim."""

from __future__ import annotations

import pytest

from kafka_stream_unify_order_messages_spark.streaming import proto_shim as PS


@pytest.fixture(scope="module")
def mod():
    return PS.build_module(PS._extract_blob(), "shim_under_test")


def _varint(v: int) -> bytes:
    out = bytearray()
    PS._write_varint(out, v)
    return bytes(out)


def test_descriptor_parses_all_client_message_types(mod):
    # every message class the pyspark state clients reference must exist
    for name in [
        "StateRequest", "StateResponse", "StateResponseWithLongTypeVal",
        "StateResponseWithStringTypeVal", "StateResponseWithListGet",
        "StateResponseWithMapKeysOrValues", "StateResponseWithMapIterator",
        "StateResponseWithTimer", "TimerInfo", "KeyAndValuePair",
        "StatefulProcessorCall", "StateVariableRequest",
        "ImplicitGroupingKeyRequest", "TimerRequest", "TimerValueRequest",
        "ExpiryTimerRequest", "GetProcessingTime", "GetWatermark",
        "UtilsRequest", "ParseStringSchema", "StateCallCommand",
        "TimerStateCallCommand", "ValueStateCall", "ListStateCall",
        "MapStateCall", "SetImplicitKey", "RemoveImplicitKey", "Exists",
        "Get", "RegisterTimer", "DeleteTimer", "ListTimers",
        "ValueStateUpdate", "Clear", "ListStateGet", "ListStatePut",
        "AppendValue", "AppendList", "GetValue", "ContainsKey",
        "UpdateValue", "Iterator", "Keys", "Values", "RemoveKey",
        "SetHandleState", "TTLConfig",
    ]:
        assert hasattr(mod, name), name
    # file-level enum values exposed as module attributes, proto3-style
    assert mod.PRE_INIT == 0
    assert mod.CREATED == 1
    assert mod.INITIALIZED == 2
    assert mod.DATA_PROCESSED == 3
    assert mod.TIMER_PROCESSED == 4
    assert mod.CLOSED == 5
    assert mod.HandleState.CLOSED == 5


def test_set_handle_state_request_bytes(mod):
    # StateRequest{statefulProcessorCall{setHandleState{state: CREATED}}}
    # field 2 msg > field 1 msg > field 1 enum=1
    msg = mod.StateRequest(
        statefulProcessorCall=mod.StatefulProcessorCall(
            setHandleState=mod.SetHandleState(state=mod.CREATED)
        )
    )
    assert msg.SerializeToString() == bytes.fromhex("12040a020801")


def test_empty_submessage_still_emits_oneof_tag(mod):
    # RemoveImplicitKey is an empty message; its presence IS the signal
    msg = mod.StateRequest(
        implicitGroupingKeyRequest=mod.ImplicitGroupingKeyRequest(
            removeImplicitKey=mod.RemoveImplicitKey()
        )
    )
    # StateRequest field 4 > ImplicitGroupingKeyRequest field 2, len 0
    assert msg.SerializeToString() == bytes.fromhex("220212 00".replace(" ", ""))


def test_attribute_write_through_ttl(mod):
    cmd = mod.StateCallCommand()
    cmd.stateName = "pending"
    cmd.schema = "s"
    cmd.ttl.durationMs = 5000  # vivify-on-read must write through
    data = cmd.SerializeToString()
    rt = mod.StateCallCommand()
    rt.ParseFromString(data)
    assert rt.stateName == "pending"
    assert rt.schema == "s"
    assert rt.ttl.durationMs == 5000


def test_proto3_zero_scalars_elided_but_decoded_as_defaults(mod):
    assert mod.SetHandleState(state=mod.PRE_INIT).SerializeToString() == b""
    resp = mod.StateResponse()
    resp.ParseFromString(b"")
    assert resp.statusCode == 0
    assert resp.errorMessage == ""
    assert resp.value == b""


def test_parse_synthetic_state_response(mod):
    # statusCode=7, errorMessage="boom", value=b"\x01\x02"
    payload = (
        _varint((1 << 3) | 0) + _varint(7)
        + _varint((2 << 3) | 2) + _varint(4) + b"boom"
        + _varint((3 << 3) | 2) + _varint(2) + b"\x01\x02"
    )
    resp = mod.StateResponse()
    resp.ParseFromString(payload)
    assert (resp.statusCode, resp.errorMessage, resp.value) == (
        7, "boom", b"\x01\x02",
    )


def test_repeated_message_and_bool_roundtrip(mod):
    rt = mod.StateResponseWithTimer(
        timer=[mod.TimerInfo(timestampMs=123), mod.TimerInfo(timestampMs=-1)],
        requireNextFetch=True,
    )
    out = mod.StateResponseWithTimer()
    out.ParseFromString(rt.SerializeToString())
    assert [t.timestampMs for t in out.timer] == [123, -1]
    assert out.requireNextFetch is True
    assert out.timer[1].HasField("timestampMs")


def test_negative_int64_ten_byte_varint(mod):
    enc = mod.StateResponseWithLongTypeVal(value=-42).SerializeToString()
    # tag 0x18, then 10-byte two's-complement varint per the spec
    assert enc[0] == 0x18 and len(enc) == 11
    out = mod.StateResponseWithLongTypeVal()
    out.ParseFromString(enc)
    assert out.value == -42


def test_repeated_bytes_list_get(mod):
    msg = mod.StateResponseWithListGet(value=[b"a", b"", b"ccc"])
    out = mod.StateResponseWithListGet()
    out.ParseFromString(msg.SerializeToString())
    assert list(out.value) == [b"a", b"", b"ccc"]


def test_which_oneof_and_unknown_fields(mod):
    req = mod.StateRequest(
        timerRequest=mod.TimerRequest(
            timerValueRequest=mod.TimerValueRequest(
                getWatermark=mod.GetWatermark()
            )
        )
    )
    assert req.WhichOneof("method") == "timerRequest"
    assert mod.StateRequest().WhichOneof("method") is None
    # unknown field numbers are skipped, not fatal
    resp = mod.StateResponse()
    resp.ParseFromString(
        _varint((9 << 3) | 0) + _varint(5)  # unknown field 9
        + _varint((1 << 3) | 0) + _varint(3)
    )
    assert resp.statusCode == 3


def test_unknown_attribute_raises(mod):
    with pytest.raises(AttributeError):
        mod.StateResponse().nonexistent_field
    with pytest.raises(AttributeError):
        mod.StateRequest().typo = 1


# --- install-time feature guard ---------------------------------------
# A pyspark upgrade whose StateMessage.proto uses wire features outside
# the shim's subset must fail at build/install time with a named gap,
# never mid-stream. Blobs below are hand-rolled FileDescriptorProto
# bytes per the public descriptor.proto field numbers.


def _len_field(num: int, payload: bytes) -> bytes:
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def _vint_field(num: int, v: int) -> bytes:
    return _varint(num << 3) + _varint(v)


def _field_desc(name: str, number: int, ftype: int) -> bytes:
    return (
        _len_field(1, name.encode())
        + _vint_field(3, number)
        + _vint_field(4, 1)  # LABEL_OPTIONAL
        + _vint_field(5, ftype)
    )


def _message_desc(name: str, *parts: bytes) -> bytes:
    return _len_field(1, name.encode()) + b"".join(parts)


def _file_desc(*messages: bytes, syntax: str = "proto3") -> bytes:
    return (
        _len_field(1, b"synthetic.proto")
        + b"".join(_len_field(4, m) for m in messages)
        + _len_field(12, syntax.encode())
    )


def test_guard_rejects_unsupported_field_type():
    blob = _file_desc(
        _message_desc("Bad", _len_field(2, _field_desc("score", 1, 1)))
    )  # type 1 = double: needs wire type 1, which the encoder never emits
    with pytest.raises(PS.UnsupportedProtoFeature, match=r"Bad\.score.*double"):
        PS.build_module(blob, "guard_under_test")


def test_guard_rejects_sint_zigzag():
    blob = _file_desc(
        _message_desc("Bad", _len_field(2, _field_desc("delta", 1, 18)))
    )  # sint64: shim has no zigzag coding
    with pytest.raises(PS.UnsupportedProtoFeature, match="sint64"):
        PS.build_module(blob, "guard_under_test")


def test_guard_rejects_map_entry_type():
    entry = _message_desc(
        "AttrsEntry",
        _len_field(2, _field_desc("key", 1, 9)),
        _len_field(2, _field_desc("value", 2, 9)),
        _len_field(7, _vint_field(7, 1)),  # options.map_entry = true
    )
    blob = _file_desc(_message_desc("Outer", _len_field(3, entry)))
    with pytest.raises(PS.UnsupportedProtoFeature, match="map<> entry"):
        PS.build_module(blob, "guard_under_test")


def test_guard_names_missing_type_as_malformed_descriptor():
    # a field descriptor with NO type field at all is a malformed /
    # partially-parsed descriptor — the guard must say so instead of
    # misdiagnosing it as an unsupported wire "type None"
    typeless = (
        _len_field(1, b"mystery")
        + _vint_field(3, 1)
        + _vint_field(4, 1)  # LABEL_OPTIONAL, but no type (tag 5)
    )
    blob = _file_desc(_message_desc("Bad", _len_field(2, typeless)))
    with pytest.raises(
        PS.UnsupportedProtoFeature,
        match=r"Bad\.mystery.*missing its type field",
    ):
        PS.build_module(blob, "guard_under_test")


def test_guard_rejects_editions_syntax():
    blob = _file_desc(_message_desc("Ok"), syntax="editions")
    with pytest.raises(PS.UnsupportedProtoFeature, match="editions"):
        PS.build_module(blob, "guard_under_test")


def test_guard_passes_supported_subset():
    blob = _file_desc(
        _message_desc(
            "Ok",
            _len_field(2, _field_desc("n", 1, 3)),      # int64
            _len_field(2, _field_desc("s", 2, 9)),      # string
            _len_field(2, _field_desc("b", 3, 12)),     # bytes
        )
    )
    mod = PS.build_module(blob, "guard_under_test")
    rt = mod.Ok(n=-7, s="x", b=b"\x00\x01")
    out = mod.Ok()
    out.ParseFromString(rt.SerializeToString())
    assert (out.n, out.s, out.b) == (-7, "x", b"\x00\x01")


def test_guard_accepts_installed_pyspark_descriptor():
    # the real descriptor must stay inside the subset (this is the
    # install-time assertion the stream relies on)
    PS._check_supported(PS._parse_file_descriptor(PS._extract_blob()))


def test_install_respects_real_protobuf_and_is_idempotent():
    import sys

    if PS.protobuf_available():
        assert PS.install() is False
        return
    installed = PS.install()
    assert installed is True
    shim = sys.modules[PS.GENERATED_MODULE]
    assert getattr(shim, "__shim__", False)
    assert PS.install() is True  # idempotent, keeps the same module
    assert sys.modules[PS.GENERATED_MODULE] is shim
    # the lazy import pattern the state clients use resolves to the shim
    import pyspark.sql.streaming.proto.StateMessage_pb2 as stateMessage

    assert stateMessage is shim
