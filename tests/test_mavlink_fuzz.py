"""Property/fuzz tests for the MAVLink codec (io/mavlink.py +
csrc/mavlink_codec.cpp): arbitrary bytes must never crash either decoder,
truncations must be rejected cleanly, and encode->mutate->decode must only
ever yield a valid message when the CRC genuinely matches."""
import ctypes

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sde4mbrl_px4_tpu.io import mavlink as mav


@pytest.fixture(scope="module")
def native():
    lib = mav.load_native()
    if lib is None:
        pytest.skip("native library not built (make -C csrc)")
    return lib


def _native_decode(native, buf: bytes):
    payload = (ctypes.c_uint8 * 256)()
    plen = ctypes.c_int()
    return native.mav_frame_decode(buf, len(buf), payload, 256,
                                   ctypes.byref(plen))


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_random_bytes_never_crash_python(data):
    msg = mav.decode_frame(data)
    # random bytes essentially never carry a valid CRC; either way the
    # decoder must return a message object or None, never raise
    assert msg is None or msg.get_type() in ("MPC_FULL_STATE",
                                             "MPC_MOTORS_CMD")


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_random_bytes_never_crash_cpp(native, data):
    rc = _native_decode(native, data)
    assert rc < 0 or rc in (mav.MSG_ID_MPC_FULL_STATE,
                            mav.MSG_ID_MPC_MOTORS_CMD)


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=60))
def test_truncated_valid_frame_rejected(cut):
    frame = bytes(mav.encode_full_state(
        12345, np.linspace(-1, 1, 13).astype(np.float32), [0.1, 0.2, 0.3, 0.4]))
    if cut >= len(frame):
        return
    assert mav.decode_frame(frame[:cut]) is None


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=200), st.integers(0, 255))
def test_single_byte_corruption_never_misdecodes(pos, val):
    """Flip one byte anywhere: the frame either still decodes to the SAME
    message (flip was a no-op or hit the truncated-zeros region... it
    can't — CRC covers the payload) or is rejected. It must never decode
    to different field values."""
    x = np.linspace(-1, 1, 13).astype(np.float32)
    frame = bytearray(mav.encode_full_state(777, x, [1, 2, 3, 4]))
    if pos >= len(frame):
        return
    orig = frame[pos]
    frame[pos] = val
    msg = mav.decode_frame(bytes(frame))
    if msg is None:
        return
    if val == orig:
        assert msg.time_usec == 777
        np.testing.assert_allclose(np.asarray(msg.state), x, atol=0)
    else:
        # A 16-bit CRC has a 2^-16 collision chance per example; with the
        # X.25 polynomial a SINGLE-byte error is always detected.
        pytest.fail(f"corrupted frame decoded: pos={pos} val={val}")


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**63 - 1),
    st.lists(st.floats(min_value=-10, max_value=10, width=32,
                       allow_nan=False), min_size=13, max_size=13),
)
def test_full_state_field_roundtrip(t_usec, state):
    x = np.asarray(state, np.float32)
    msg = mav.decode_frame(bytes(mav.encode_full_state(t_usec, x)))
    assert msg is not None
    assert msg.time_usec == t_usec
    np.testing.assert_array_equal(np.asarray(msg.state), x)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(min_value=0, max_value=1, width=32,
                       allow_nan=False), min_size=6, max_size=6),
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=100),
)
def test_motors_cmd_field_roundtrip_cross_impl(native, motors, mpc_on, weight):
    """Python-encoded frames decode identically through the C++ codec for
    arbitrary field values (incl. trailing zeros, which MAVLink v2
    truncates on the wire)."""
    m = np.asarray(motors, np.float32)
    tr = np.asarray([m[:4].mean(), 0.0, 0.0, 0.0], np.float32)
    frame = bytes(mav.encode_motors_cmd(42, m, tr, mpc_on, weight))
    py = mav.decode_frame(frame)
    assert py is not None and py.mpc_on == mpc_on and py.weight_motors == weight
    np.testing.assert_array_equal(np.asarray(py.motor_val_des), m)

    rc = _native_decode(native, frame)
    assert rc == mav.MSG_ID_MPC_MOTORS_CMD
