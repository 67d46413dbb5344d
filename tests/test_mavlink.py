"""MAVLink codec tests: Python round-trip, C++ cross-parity, UDP loop."""
import ctypes
import os
import threading

import numpy as np
import pytest

from sde4mbrl_px4_tpu.io import mavlink as mav


def _state():
    rs = np.random.RandomState(0)
    x = rs.randn(13).astype(np.float32)
    return x


def test_python_roundtrip_full_state():
    x = _state()
    frame = mav.encode_full_state(123456789, x, [0.1, 0.2, 0.3, 0.4])
    msg = mav.decode_frame(frame)
    assert msg is not None and msg.get_type() == "MPC_FULL_STATE"
    assert msg.time_usec == 123456789
    np.testing.assert_allclose(msg.state, x, atol=0)
    np.testing.assert_allclose(msg.motors, [0.1, 0.2, 0.3, 0.4], atol=1e-7)
    # pymavlink-style field access (reference reads msg.x..msg.wz)
    assert msg.x == pytest.approx(float(x[0]))
    assert msg.wz == pytest.approx(float(x[12]))


def test_python_roundtrip_motors_cmd():
    frame = mav.encode_motors_cmd(42, [0.7, 0.7, 0.7, 0.7], [0.7, 0.0, 0.1, -0.1],
                                  mpc_on=5, weight_motors=50)
    msg = mav.decode_frame(frame)
    assert msg.get_type() == "MPC_MOTORS_CMD"
    assert msg.time_usec == 42
    np.testing.assert_allclose(msg.motor_val_des[:4], 0.7, atol=1e-7)
    np.testing.assert_allclose(msg.motor_val_des[4:], 0.0)
    assert msg.mpc_on == 5 and msg.weight_motors == 50


def test_trailing_zero_truncation():
    """v2 frames truncate trailing zero payload bytes; decode re-extends."""
    frame = mav.encode_motors_cmd(1, [0.5, 0, 0, 0], [0, 0, 0, 0], 0, 0)
    full = mav.encode_motors_cmd(1, [0.5, 0.1, 0.2, 0.3], [1, 1, 1, 1], 3, 100)
    assert len(frame) < len(full)
    msg = mav.decode_frame(frame)
    assert msg.weight_motors == 0 and float(msg.motor_val_des[0]) == 0.5


def test_corrupted_frame_rejected():
    frame = bytearray(mav.encode_full_state(7, _state()))
    frame[15] ^= 0xFF
    assert mav.decode_frame(bytes(frame)) is None


@pytest.fixture(scope="module")
def native():
    lib = mav.load_native()
    if lib is None:
        pytest.skip("native library not built (make -C csrc)")
    return lib


def test_crc_extra_parity_with_cpp(native):
    for msgid in (mav.MSG_ID_MPC_FULL_STATE, mav.MSG_ID_MPC_MOTORS_CMD):
        assert native.mav_crc_extra(msgid) == mav.crc_extra(msgid)


def test_cpp_decodes_python_frame(native):
    x = _state()
    frame = mav.encode_full_state(999, x, [1, 2, 3, 4], seq=7)
    payload = (ctypes.c_uint8 * 128)()
    plen = ctypes.c_int()
    msgid = native.mav_frame_decode(bytes(frame), len(frame), payload,
                                    128, ctypes.byref(plen))
    assert msgid == mav.MSG_ID_MPC_FULL_STATE
    t = ctypes.c_uint64()
    st = (ctypes.c_float * 13)()
    m = (ctypes.c_float * 4)()
    native.mav_decode_full_state(payload, ctypes.byref(t), st, m)
    assert t.value == 999
    np.testing.assert_allclose(np.array(st[:]), x, atol=0)


def test_python_decodes_cpp_frame(native):
    motors = (ctypes.c_float * 6)(0.1, 0.2, 0.3, 0.4, 0.5, 0.6)
    tr = (ctypes.c_float * 4)(0.7, -0.1, 0.2, 0.0)
    out = (ctypes.c_uint8 * 256)()
    n = native.mav_encode_motors_cmd(out, ctypes.c_uint64(555), motors, tr,
                                     5, 100, 0, 1, 1)
    msg = mav.decode_frame(bytes(out[:n]))
    assert msg is not None and msg.get_type() == "MPC_MOTORS_CMD"
    assert msg.time_usec == 555 and msg.mpc_on == 5 and msg.weight_motors == 100
    np.testing.assert_allclose(msg.motor_val_des, np.array(motors[:]), atol=1e-7)


def test_udp_state_command_loop():
    """Full UDP exchange: FCU-sim client sends state, engine server replies
    motor command (the router_sitl.conf topology without the router)."""
    import socket

    srv = mav.MavlinkUDP("127.0.0.1:0", mode="udpin")
    port = srv.sock.getsockname()[1]
    cli = mav.MavlinkUDP(f"127.0.0.1:{port}", mode="udpout")

    x = _state()
    cli.send_full_state(777, x)
    msg = srv.recv_match(type="MPC_FULL_STATE", timeout=2.0)
    assert msg is not None and msg.time_usec == 777
    srv.send_motors_cmd(778, [0.7] * 4, [0.7, 0, 0, 0], 3, 0)
    rep = cli.recv_match(type="MPC_MOTORS_CMD", timeout=2.0)
    assert rep is not None and rep.time_usec == 778 and rep.mpc_on == 3
    srv.close(); cli.close()


def test_recv_match_timeout_respects_deadline_under_icmp_refusals():
    """A connected udpout socket whose peer is down surfaces ICMP
    port-unreachable as ConnectionRefusedError on recvfrom; recv_match must
    swallow those WITHOUT extending the call past its timeout (each refusal
    used to re-arm a fresh full window)."""
    import socket as _socket
    import threading
    import time as _time

    # Peer port chosen closed: find one by binding/closing.
    probe = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    cli = mav.MavlinkUDP(f"127.0.0.1:{port}", mode="udpout")
    stop = threading.Event()

    def _spam():
        # Generate a steady stream of ICMP refusals on the connected socket.
        while not stop.is_set():
            try:
                cli.send_full_state(1, _state())
            except OSError:
                pass
            _time.sleep(0.005)

    th = threading.Thread(target=_spam, daemon=True)
    th.start()
    t0 = _time.monotonic()
    out = cli.recv_match(type="MPC_MOTORS_CMD", timeout=0.3)
    elapsed = _time.monotonic() - t0
    stop.set(); th.join(timeout=1.0)
    cli.close()
    assert out is None
    assert elapsed < 1.5, f"recv_match overstayed its 0.3 s timeout: {elapsed:.2f}s"
