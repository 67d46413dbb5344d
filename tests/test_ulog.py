"""PX4 ULog IO (io/ulog.py): binary roundtrip, flight-log bridging in both
directions, malformed/truncated input handling."""
import os
import struct

import numpy as np
import pytest

from sde4mbrl_px4_tpu.io.ulog import (
    flight_log_to_ulog, read_ulog, ulog_to_flight_log, write_ulog,
)


def _mklog(n=50, dt=0.02):
    t = np.arange(n) * dt
    state = np.zeros((n, 13), np.float32)
    state[:, 0] = np.sin(t)
    state[:, 2] = -1.0
    state[:, 6] = 1.0
    state[:, 10] = 0.3 * np.cos(t)
    return {
        "t": t,
        "state": state,
        "cmd_motors": np.tile(np.linspace(0.3, 0.8, 6, dtype=np.float32),
                              (n, 1)),
        "cmd_thrust_rates": np.tile(
            np.array([0.55, 0.1, -0.2, 0.05], np.float32), (n, 1)),
        "ref": np.zeros((n, 13), np.float32),
        "mpc_on": np.full(n, 5),
        "weight_motors": np.full(n, 100),
        "solve_time": np.full(n, 0.01, np.float32),
        "num_steps": np.full(n, 40),
        "opt_cost": np.full(n, 1.5, np.float32),
        "mpc_indx": np.zeros(n, np.int64),
    }


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "t.ulg")
    topics = {
        "demo_topic": {
            "timestamp": (np.arange(10) * 1000).astype(np.uint64),
            "val": np.linspace(0, 1, 10).astype(np.float32),
            "vec": np.arange(30, dtype=np.float32).reshape(10, 3),
            "flag": np.array([True] * 10),
        }
    }
    write_ulog(p, topics, start_ts_usec=123)
    out = read_ulog(p)
    assert out["start_timestamp"] == 123
    d = out["data"]["demo_topic"]
    np.testing.assert_array_equal(d["timestamp"], topics["demo_topic"]["timestamp"])
    np.testing.assert_allclose(d["val"], topics["demo_topic"]["val"])
    np.testing.assert_allclose(d["vec"], topics["demo_topic"]["vec"])
    assert d["flag"].all()


def test_flight_log_ulog_bridge_roundtrip(tmp_path):
    """framework log -> .ulg -> framework log preserves state/commands
    (the PlotJuggler-compatible export and the real-flight import)."""
    log = _mklog()
    p = str(tmp_path / "flight.ulg")
    flight_log_to_ulog(log, p)
    back = ulog_to_flight_log(p)
    np.testing.assert_allclose(back["t"], log["t"], atol=2e-6)
    np.testing.assert_allclose(back["state"][:, :13], log["state"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(back["cmd_motors"], log["cmd_motors"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(back["cmd_thrust_rates"],
                               log["cmd_thrust_rates"], rtol=1e-5, atol=1e-5)


def test_ulog_tolerates_unknown_and_nested_messages(tmp_path):
    """Unknown message types, info/param records and nested-format topics
    must be skipped, not fatal (real PX4 logs carry all of these)."""
    p = str(tmp_path / "x.ulg")
    write_ulog(p, {"ok_topic": {
        "timestamp": np.array([1, 2], np.uint64),
        "v": np.array([0.5, 0.75], np.float32)}})
    raw = bytearray(open(p, "rb").read())
    # Append: a format with a nested type, its subscription + data, an info
    # message, and an unknown message type.
    def msg(t, payload):
        return struct.pack("<HB", len(payload), ord(t)) + payload

    raw += msg("F", b"nested_topic:uint64_t timestamp;my_struct_t s;")
    raw += msg("A", struct.pack("<BH", 0, 77) + b"nested_topic")
    raw += msg("D", struct.pack("<H", 77) + b"\x00" * 16)
    key = b"char[3] foo"
    raw += msg("I", bytes([len(key)]) + key + b"bar")
    raw += msg("Z", b"\x01\x02")   # unknown type
    open(p, "wb").write(bytes(raw))

    out = read_ulog(p)
    assert "ok_topic" in out["data"]
    assert "nested_topic" not in out["data"]
    assert out["info"].get("char[3] foo") == b"bar"


def test_ulog_truncated_tail(tmp_path):
    """A log cut mid-message (power loss) keeps everything before the cut."""
    p = str(tmp_path / "t.ulg")
    write_ulog(p, {"tp": {"timestamp": np.arange(20, dtype=np.uint64),
                          "v": np.arange(20, dtype=np.float32)}})
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-5])
    out = read_ulog(p)
    assert len(out["data"]["tp"]["v"]) >= 19


def test_read_rejects_non_ulog(tmp_path):
    p = str(tmp_path / "bad.ulg")
    open(p, "wb").write(b"NOTAULOGFILE" * 4)
    with pytest.raises(ValueError):
        read_ulog(p)


def test_analyze_renders_ulg(tmp_path):
    """tools/analyze.py accepts .ulg input directly."""
    mpl = pytest.importorskip("matplotlib")
    from tools.analyze import analyze

    log = _mklog(n=80)
    p = str(tmp_path / "flight.ulg")
    flight_log_to_ulog(log, p)
    out = str(tmp_path / "a.png")
    analyze(p, out)
    assert os.path.exists(out) and os.path.getsize(out) > 10_000


def test_flight_recorder_saves_ulg(tmp_path):
    from sde4mbrl_px4_tpu.io.flight_log import FlightRecorder

    r = FlightRecorder()
    for k in range(10):
        r.record(k * 0.02, np.r_[np.zeros(6), 1.0, np.zeros(6)].astype(np.float32),
                 cmd_motors=np.full(6, 0.5, np.float32))
    p = str(tmp_path / "f.ulg")
    r.save(p)
    d = read_ulog(p)["data"]
    assert len(d["vehicle_local_position"]["timestamp"]) == 10
    # Recorder logs carry the achieved-motors field (zeros here: no FCU
    # readings were recorded), so actuator_motors is ACHIEVED and the
    # commanded channel lives under the reference's own topic.
    np.testing.assert_allclose(d["actuator_motors"]["control"], 0.0)
    np.testing.assert_allclose(
        d["mpc_motors_cmd"]["motor_val_des"][:, 0], 0.5)


# ---- parser fuzz: arbitrary bytes must never crash -------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=256))
def test_read_ulog_random_bytes_never_crash(tmp_path_factory, data):
    p = str(tmp_path_factory.mktemp("fz") / "f.ulg")
    open(p, "wb").write(data)
    try:
        out = read_ulog(p)
        assert isinstance(out["data"], dict)   # parsed (magic happened to match)
    except ValueError:
        pass                                    # rejected: fine


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=192))
def test_read_ulog_valid_header_garbage_body(tmp_path_factory, data):
    """A valid header followed by arbitrary bytes must parse to SOMETHING
    (possibly empty) without raising."""
    p = str(tmp_path_factory.mktemp("fz") / "g.ulg")
    hdr = b"ULog\x01\x12\x35\x01" + struct.pack("<Q", 42)
    open(p, "wb").write(hdr + data)
    out = read_ulog(p)
    assert out["start_timestamp"] == 42


def test_trailing_padding_elided_like_px4(tmp_path):
    """Real PX4 logs elide a TRAILING _padding field from each data
    message (ULog spec); the parser's dtype must match the wire layout or
    every row after the first misaligns."""
    p = str(tmp_path / "pad.ulg")
    hdr = b"ULog\x01\x12\x35\x01" + struct.pack("<Q", 7)

    def msg(t, payload):
        return struct.pack("<HB", len(payload), ord(t)) + payload

    body = msg("F", b"pt:uint64_t timestamp;float v;uint8_t[3] _padding0;")
    body += msg("A", struct.pack("<BH", 0, 0) + b"pt")
    for k in range(4):   # wire rows are 12 bytes: padding NOT written
        body += msg("D", struct.pack("<H", 0)
                    + struct.pack("<Qf", 1000 * k, 0.5 * k))
    open(p, "wb").write(hdr + body)
    d = read_ulog(p)["data"]["pt"]
    np.testing.assert_array_equal(d["timestamp"], [0, 1000, 2000, 3000])
    np.testing.assert_allclose(d["v"], [0.0, 0.5, 1.0, 1.5])


def test_ulog_ref_column_is_nan(tmp_path):
    """ulog_to_flight_log marks 'no reference' as NaN (the flight-log
    schema's convention) so analyze.py doesn't overlay a bogus origin ref."""
    log = _mklog(n=10)
    p = str(tmp_path / "r.ulg")
    flight_log_to_ulog(log, p)
    back = ulog_to_flight_log(p)
    assert np.isnan(back["ref"]).all()


def test_mpc_motors_cmd_topic_and_achieved_motors(tmp_path):
    """The export separates COMMANDED (mpc_motors_cmd — the reference's own
    topic, curves of new_analyze_mpc_v3.xml) from ACHIEVED motors
    (actuator_motors, from the FCU's m1..m4 readings when the log carries
    them; commanded fallback otherwise for legacy logs)."""
    log = _mklog(n=12)
    log["motors"] = np.tile(np.linspace(0.31, 0.61, 4, dtype=np.float32),
                            (12, 1))
    p = str(tmp_path / "cmd.ulg")
    flight_log_to_ulog(log, p)
    d = read_ulog(p)["data"]
    np.testing.assert_allclose(d["mpc_motors_cmd"]["motor_val_des"],
                               log["cmd_motors"], atol=1e-6)
    np.testing.assert_allclose(d["mpc_motors_cmd"]["thrust_and_angrate_des"],
                               log["cmd_thrust_rates"], atol=1e-6)
    assert np.all(d["mpc_motors_cmd"]["mpc_on"] == 5)
    # achieved motors land in actuator_motors
    np.testing.assert_allclose(d["actuator_motors"]["control"],
                               log["motors"], atol=1e-6)
    # legacy log without achieved readings: commanded fallback
    p2 = str(tmp_path / "legacy.ulg")
    flight_log_to_ulog(_mklog(n=12), p2)
    d2 = read_ulog(p2)["data"]
    np.testing.assert_allclose(d2["actuator_motors"]["control"],
                               _mklog(n=12)["cmd_motors"], atol=1e-6)


@pytest.mark.parametrize("name", ["pj_mpc_tracking.xml",
                                  "pj_mpc_cmd_vs_achieved.xml",
                                  "pj_mpc_cmd_vs_achieved_v2.xml"])
def test_committed_layout_matches_exported_topics(tmp_path, name):
    """Every shipped PlotJuggler layout (incl. the commanded-vs-achieved
    port of the reference's new_analyze_mpc_v3.xml) references only
    topics/fields that flight_log_to_ulog actually exports — a layout that
    opens empty is a broken asset."""
    import xml.etree.ElementTree as ET

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    layout = os.path.join(root, "configs", "layouts", name)
    tree = ET.parse(layout)                      # well-formed XML
    curves = [c.get("name") for c in tree.iter("curve")]
    curves += [c.get("curve_x") for c in tree.iter("curve")
               if c.get("curve_x")]
    assert len(set(curves)) >= 15

    p = str(tmp_path / "layout_check.ulg")
    flight_log_to_ulog(_mklog(), p)
    data = read_ulog(p)["data"]
    for ref in curves:
        topic, field = ref.split("/", 1)
        assert topic in data, f"layout topic {topic} not exported"
        if "." in field:                         # array field: xyz.01
            base, idx = field.rsplit(".", 1)
            col = data[topic][base]
            assert col.ndim == 2 and col.shape[1] > int(idx), ref
        else:
            assert field in data[topic], ref
