"""Router tests: conf parsing and id-filtered fan-out (reference
scripts/router_sitl.conf topology)."""
import os
import socket
import time

import numpy as np
import pytest

from sde4mbrl_px4_tpu.io import mavlink as mav
from sde4mbrl_px4_tpu.io.router import Endpoint, Router, parse_conf

_REF_CONF = """
# The master node is exchanging data with the PX4 autopilot
[UdpEndpoint PX4]
\tMode = Server
\tAddress = 127.0.0.1
\tPort = 0

[UdpEndpoint Mavros]
\tMode = Normal
\tAddress = 127.0.0.1
\tPort = 0

[UdpEndpoint MPC]
\tMode = Normal
\tAddress = 127.0.0.1
\tPort = 0
\tAllowMsgIdIn = 368 # MPC_MOTORS_CMD
\tAllowMsgIdOut = 367 # MPC_FULL_STATE

[General]
\tTcpServerPort=5760
"""


def test_parse_reference_conf_dialect():
    eps = parse_conf(_REF_CONF)
    assert [e.name for e in eps] == ["PX4", "Mavros", "MPC"]
    assert eps[0].mode == "Server" and eps[1].mode == "Normal"
    assert eps[2].allow_in == {368}
    assert eps[2].allow_out == {367}
    assert eps[0].allow_in is None  # unrestricted


def test_parse_shipped_reference_conf():
    """Parse the actual reference conf file syntax end-to-end."""
    import os

    ref = "/root/reference/scripts/router_sitl.conf"
    if not os.path.exists(ref):
        pytest.skip("reference tree not mounted")
    eps = parse_conf(open(ref).read())
    names = [e.name for e in eps]
    assert names == ["PX4", "Mavros", "MPC"]
    mpc = eps[2]
    assert mpc.port == 14998 and mpc.allow_in == {368} and mpc.allow_out == {367}


@pytest.fixture(params=["py", "native"])
def topology(request):
    """FCU (server) + mavros-like sink + MPC sink with id filters; all on
    ephemeral ports. Parametrized over BOTH router implementations — the
    Python twin and the C++ core (csrc/router.cpp) — so the native
    mavlink-routerd replacement is held to the same behavior."""
    fcu = Endpoint("PX4", "127.0.0.1", 0, mode="Server")
    # sinks: plain UDP sockets we control directly
    mavros_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    mavros_sock.bind(("127.0.0.1", 0))
    mavros_sock.settimeout(1.0)
    mpc_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    mpc_sock.bind(("127.0.0.1", 0))
    mpc_sock.settimeout(1.0)

    mavros_ep = Endpoint("Mavros", "127.0.0.1", mavros_sock.getsockname()[1])
    mpc_ep = Endpoint("MPC", "127.0.0.1", mpc_sock.getsockname()[1],
                      allow_in={368}, allow_out={367})
    if request.param == "native":
        from sde4mbrl_px4_tpu.io.mavlink import load_native
        from sde4mbrl_px4_tpu.io.router import NativeRouter

        lib = load_native()
        if lib is None or not hasattr(lib, "router_new"):
            pytest.skip("native router not built (make -C csrc)")
        r = NativeRouter([fcu, mavros_ep, mpc_ep])
        r.start()
        ports = {n: r.bound_port(n) for n in ("PX4", "Mavros", "MPC")}
    else:
        r = Router([fcu, mavros_ep, mpc_ep])
        r.start()
        ports = {e.name: e.bound_port for e in (fcu, mavros_ep, mpc_ep)}
    yield r, ports, mavros_sock, mpc_sock
    r.stop()
    mavros_sock.close()
    mpc_sock.close()


def test_fanout_with_id_filter(topology):
    r, ports, mavros_sock, mpc_sock = topology
    # "FCU" talks to the router's server endpoint.
    fcu_client = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    fcu_port = ports["PX4"]
    state_frame = mav.encode_full_state(111, np.zeros(13, np.float32))
    hb_like = mav.encode_motors_cmd(5, [0.1] * 4, [0, 0, 0, 0], 0, 0)

    # id 367 goes to BOTH mavros and MPC (MPC allows 367 out).
    fcu_client.sendto(state_frame, ("127.0.0.1", fcu_port))
    got_mavros, _ = mavros_sock.recvfrom(512)
    got_mpc, _ = mpc_sock.recvfrom(512)
    assert got_mavros == bytes(state_frame) and got_mpc == bytes(state_frame)

    # id 368 from FCU: mavros receives it, MPC endpoint filters it OUT.
    fcu_client.sendto(hb_like, ("127.0.0.1", fcu_port))
    got_mavros2, _ = mavros_sock.recvfrom(512)
    assert got_mavros2 == bytes(hb_like)
    with pytest.raises(socket.timeout):
        mpc_sock.settimeout(0.3)
        mpc_sock.recvfrom(512)
    fcu_client.close()


def test_mpc_reply_routes_back_to_fcu(topology):
    r, ports, mavros_sock, mpc_sock = topology
    fcu_client = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    fcu_client.settimeout(1.0)
    fcu_client.bind(("127.0.0.1", 0))
    fcu_port = ports["PX4"]

    # Teach the server endpoint its peer first (as the FCU would).
    state_frame = mav.encode_full_state(1, np.zeros(13, np.float32))
    fcu_client.sendto(state_frame, ("127.0.0.1", fcu_port))
    mavros_sock.recvfrom(512)
    mpc_sock.recvfrom(512)

    # MPC replies with id 368 INTO the router -> must reach the FCU peer.
    cmd = mav.encode_motors_cmd(7, [0.7] * 4, [0.7, 0, 0, 0], 5, 100)
    mpc_sock.sendto(cmd, ("127.0.0.1", ports["MPC"]))
    got, _ = fcu_client.recvfrom(512)
    msg = mav.decode_frame(got)
    assert msg is not None and msg.get_type() == "MPC_MOTORS_CMD"
    assert msg.time_usec == 7
    fcu_client.close()


def test_mpc_inbound_filter_drops_wrong_ids(topology):
    """Id 367 arriving FROM the MPC endpoint is dropped (AllowMsgIdIn=368)."""
    r, ports, mavros_sock, mpc_sock = topology
    fcu_client = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    fcu_client.settimeout(0.3)
    fcu_client.bind(("127.0.0.1", 0))
    state = mav.encode_full_state(1, np.zeros(13, np.float32))
    fcu_client.sendto(state, ("127.0.0.1", ports["PX4"]))
    mavros_sock.recvfrom(512)
    mpc_sock.recvfrom(512)

    # Spoofed 367 from the MPC side must NOT be forwarded anywhere.
    mpc_sock.sendto(state, ("127.0.0.1", ports["MPC"]))
    with pytest.raises(socket.timeout):
        fcu_client.recvfrom(512)
    fcu_client.close()


def test_launch_router_conf_parses(repo_root):
    """The shipped SITL router conf + launch tier: endpoints and filters
    match the reference topology (full stream to telemetry, 367/368-only
    to the MPC endpoint, live tap)."""
    from sde4mbrl_px4_tpu.io.router import parse_conf

    with open(os.path.join(repo_root, "configs/router_sitl.conf")) as f:
        eps = parse_conf(f.read())
    by_name = {e.name: e for e in eps}
    assert set(by_name) == {"fcu", "telemetry", "mpc", "liveview"}
    assert by_name["mpc"].allow_out == {367}
    assert by_name["mpc"].allow_in == {368}
    assert by_name["telemetry"].allow_out is None
    assert by_name["liveview"].allow_out == {367, 368}


def test_parse_shipped_hexa_conf(repo_root):
    """The vehicle-topology conf (tabs, inline comments, UartEndpoint +
    General sections) parses with ZERO ignored sections: the UART leg
    becomes a SerialEndpoint, the UDP endpoints keep their filters."""
    import os

    from sde4mbrl_px4_tpu.io.router import SerialEndpoint

    eps = parse_conf(open(os.path.join(repo_root, "configs",
                                       "router_hexa.conf")).read())
    assert [e.name for e in eps] == ["fcu", "telemetry", "mpc"]
    assert isinstance(eps[0], SerialEndpoint)
    assert eps[0].device == "/dev/ttyUSB0" and eps[0].baud == 921600
    mpc = eps[2]
    assert mpc.address == "192.168.1.207" and mpc.port == 14998
    assert mpc.allow_in == {368} and mpc.allow_out == {367}


def test_parse_reference_hexa_conf_uart():
    """The reference's REAL vehicle conf (UartEndpoint first,
    scripts/router_hexa.conf:2-4) loads unchanged with no section ignored:
    the UART endpoint carries its Device/Baud, the UDP endpoints their
    filters."""
    import os

    from sde4mbrl_px4_tpu.io.router import SerialEndpoint

    ref = "/root/reference/scripts/router_hexa.conf"
    if not os.path.exists(ref):
        pytest.skip("reference tree not mounted")
    eps = parse_conf(open(ref).read())
    assert [e.name for e in eps] == ["PX4", "Mavros", "MPC"]
    assert isinstance(eps[0], SerialEndpoint)
    assert eps[0].device == "/dev/ttyUSB0" and eps[0].baud == 921600
    assert eps[2].allow_in == {368} and eps[2].allow_out == {367}


@pytest.fixture(params=["py", "native"])
def uart_topology(request):
    """Serial FCU leg (pty pair standing in for the UART wire) + an
    id-filtered MPC UDP sink — the reference's real-vehicle topology
    (``scripts/router_hexa.conf``), parametrized over both router
    implementations. Yields (router, master_fd, mpc_sock, mpc_port)."""
    import os
    import pty

    from sde4mbrl_px4_tpu.io.router import NativeRouter, SerialEndpoint

    master, slave = pty.openpty()
    fcu = SerialEndpoint("PX4", os.ttyname(slave), baud=921600)
    mpc_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    mpc_sock.bind(("127.0.0.1", 0))
    mpc_sock.settimeout(2.0)
    mpc_ep = Endpoint("MPC", "127.0.0.1", mpc_sock.getsockname()[1],
                      allow_in={368}, allow_out={367})
    if request.param == "native":
        from sde4mbrl_px4_tpu.io.mavlink import load_native

        lib = load_native()
        if lib is None or not hasattr(lib, "router_add_uart"):
            pytest.skip("native UART router not built (make -C csrc)")
        r = NativeRouter([fcu, mpc_ep])
        r.start()
        mpc_port = r.bound_port("MPC")
    else:
        r = Router([fcu, mpc_ep])
        r.start()
        mpc_port = mpc_ep.bound_port
    yield r, master, mpc_sock, mpc_port
    r.stop()
    os.close(master)
    os.close(slave)
    mpc_sock.close()


def test_uart_to_udp_and_back(uart_topology):
    """Frames route serial->UDP and UDP->serial under the msg-id filters:
    the full real-vehicle loop (FCU state out over the wire, motor
    commands back onto it)."""
    import os

    r, master, mpc_sock, mpc_port = uart_topology

    # FCU -> wire: id 367 must cross to the MPC endpoint (AllowMsgIdOut).
    state = mav.encode_full_state(42, np.arange(13, dtype=np.float32))
    os.write(master, state)
    got, _ = mpc_sock.recvfrom(512)
    assert got == bytes(state)

    # MPC -> UDP -> wire: id 368 accepted in, written onto the serial line.
    cmd = mav.encode_motors_cmd(7, [0.7] * 6, [0.7, 0, 0, 0], 5, 100)
    mpc_sock.sendto(cmd, ("127.0.0.1", mpc_port))
    back = b""
    deadline = time.time() + 2.0
    while len(back) < len(cmd) and time.time() < deadline:
        back += os.read(master, 512)
    msg = mav.decode_frame(back)
    assert msg is not None and msg.get_type() == "MPC_MOTORS_CMD"
    assert msg.time_usec == 7

    # id 368 arriving FROM the FCU side is filtered out of the MPC leg
    # (AllowMsgIdOut = 367 only).
    os.write(master, cmd)
    with pytest.raises(socket.timeout):
        mpc_sock.settimeout(0.3)
        mpc_sock.recvfrom(512)


def test_uart_stream_reassembly(uart_topology):
    """Serial is a byte stream: frames written fragmented, concatenated,
    and after line noise must still come out whole (deframer resync)."""
    import os

    r, master, mpc_sock, mpc_port = uart_topology
    f1 = mav.encode_full_state(1, np.zeros(13, np.float32), seq=1)
    f2 = mav.encode_full_state(2, np.ones(13, np.float32), seq=2)

    # fragmented mid-frame write
    os.write(master, f1[:9])
    time.sleep(0.05)
    os.write(master, f1[9:])
    got1, _ = mpc_sock.recvfrom(512)
    assert got1 == bytes(f1)

    # noise + two concatenated frames in one write
    os.write(master, b"\x00\x11garbage" + f1 + f2)
    got = {mpc_sock.recvfrom(512)[0], mpc_sock.recvfrom(512)[0]}
    assert got == {bytes(f1), bytes(f2)}


def test_deframer_unit():
    """Deframer edge cases: v1+v2 mix, byte-at-a-time feed, magic byte
    inside a payload must not desync (length-based walk)."""
    from sde4mbrl_px4_tpu.io.router import Deframer

    v2 = mav.encode_full_state(9, np.full(13, 0xFD / 255, np.float32))
    v1 = bytes([0xFE, 3, 0, 1, 1, 0, 7, 7, 7, 0, 0])  # minimal v1 frame
    d = Deframer()
    out = []
    for b in bytes(v2) + v1 + bytes(v2):
        out += d.feed(bytes([b]))
    assert out == [bytes(v2), v1, bytes(v2)]
    # payload containing 0xFD magics (the state above encodes some) came
    # through undamaged => the walk is length-based, not magic-scanning
    # inside frames.
    assert mav.decode_frame(out[0]).time_usec == 9


def _heartbeat(armed: bool, seq: int = 0, compid: int = 1) -> bytes:
    """Minimal MAVLink v2 HEARTBEAT (msgid 0): custom_mode u32, type,
    autopilot, base_mode (bit 0x80 = armed), system_status, version. The
    router never validates CRC, so a placeholder CRC is fine. compid 1 =
    the autopilot (the component whose heartbeat gates arm state)."""
    payload = bytes([0, 0, 0, 0, 2, 12, 0x80 if armed else 0x00, 4, 3])
    hdr = bytes([0xFD, len(payload), 0, 0, seq & 0xFF, 1, compid & 0xFF,
                 0, 0, 0])
    return hdr + payload + b"\x00\x00"


def test_parse_general_logging_directives():
    """[General] Log/LogMode parse (reference router_sitl.conf:27-28 ships
    them commented — commented lines must stay inert)."""
    from sde4mbrl_px4_tpu.io.router import parse_general

    ref = "/root/reference/scripts/router_sitl.conf"
    if os.path.exists(ref):
        g = parse_general(open(ref).read())
        assert g.log_dir is None            # commented out in the reference
        assert g.log_mode == "while-armed"  # the default

    g = parse_general(_REF_CONF + "\n\tLog = /tmp/fl\n\tLogMode = always\n")
    assert g.log_dir == "/tmp/fl" and g.log_mode == "always"
    with pytest.raises(ValueError, match="LogMode"):
        parse_general("[General]\nLogMode = sometimes\n")


@pytest.mark.parametrize("impl", ["py", "native"])
def test_flight_log_parity_and_replay(impl, tmp_path):
    """Log = <dir> (mode always): a routed burst lands in a .tlog in BOTH
    implementations, with identical decoded message sequences, and every
    frame replays through the live-view decoder (io/mavlink.decode_frame,
    the same function tools/analyze.py --live feeds from)."""
    from sde4mbrl_px4_tpu.io.router import NativeRouter, read_tlog

    log_dir = str(tmp_path / impl)
    fcu = Endpoint("PX4", "127.0.0.1", 0, mode="Server")
    sink_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sink_sock.bind(("127.0.0.1", 0))
    sink_sock.settimeout(1.0)
    sink = Endpoint("MPC", "127.0.0.1", sink_sock.getsockname()[1],
                    allow_in={368}, allow_out={367})
    if impl == "native":
        from sde4mbrl_px4_tpu.io.mavlink import load_native

        lib = load_native()
        if lib is None or not hasattr(lib, "router_set_log"):
            pytest.skip("native router logging not built (make -C csrc)")
        r = NativeRouter([fcu, sink], log_dir=log_dir, log_mode="always")
        r.start()
        fcu_port = r.bound_port("PX4")
    else:
        r = Router([fcu, sink], log_dir=log_dir, log_mode="always")
        r.start()
        fcu_port = fcu.bound_port

    client = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sent = []
    for k in range(20):
        f = mav.encode_full_state(100 + k, np.full(13, 0.1 * k, np.float32),
                                  seq=k)
        client.sendto(f, ("127.0.0.1", fcu_port))
        sent.append(("MPC_FULL_STATE", 100 + k))
        sink_sock.recvfrom(512)            # routed through
    # a reply from the MPC side is ALSO logged (accepted by AllowMsgIdIn)
    cmd = mav.encode_motors_cmd(777, [0.7] * 4, [0.7, 0, 0, 0], 5, 100)
    sink_sock.sendto(cmd, ("127.0.0.1", sink.bound_port if impl == "py"
                           else r.bound_port("MPC")))
    sent.append(("MPC_MOTORS_CMD", 777))
    time.sleep(0.3)
    r.stop()
    client.close()
    sink_sock.close()

    logs = [f for f in os.listdir(log_dir) if f.endswith(".tlog")]
    assert len(logs) == 1 and logs[0].startswith("00001-")
    decoded = []
    for t_usec, frame in read_tlog(os.path.join(log_dir, logs[0])):
        assert t_usec > 1e15                # wall-clock µs, sane
        msg = mav.decode_frame(frame)       # the --live decoder
        assert msg is not None
        decoded.append((msg.get_type(), int(msg.time_usec)))
    assert decoded == sent


def test_flight_log_while_armed_gating(tmp_path):
    """LogMode = while-armed: frames before the armed HEARTBEAT are not
    logged; frames between armed and disarmed are (both implementations)."""
    from sde4mbrl_px4_tpu.io.router import FrameLog, read_tlog

    path = str(tmp_path / "wa.tlog")
    fl = FrameLog(path, mode="while-armed")
    pre = mav.encode_full_state(1, np.zeros(13, np.float32))
    fl.log(pre)                              # disarmed: dropped
    fl.log(_heartbeat(True))                 # arms AND logs the heartbeat
    mid = mav.encode_full_state(2, np.zeros(13, np.float32))
    fl.log(mid)
    fl.log(_heartbeat(False))                # disarms: dropped
    fl.log(mav.encode_full_state(3, np.zeros(13, np.float32)))
    fl.close()
    got = [mav.decode_frame(f) for _, f in read_tlog(path)]
    times = [int(m.time_usec) for m in got if m is not None]
    assert times == [2]                      # only the armed-window state
    assert fl.frames_logged == 2             # heartbeat + one state


def test_gcs_heartbeat_does_not_disarm_log(tmp_path):
    """A GCS/companion HEARTBEAT (compid != 1) carries ITS OWN base_mode
    with the armed bit clear — it must not gate the flight log (the
    shipped confs leave the telemetry endpoint unfiltered, so QGC
    heartbeats DO reach the logger; mavlink-router gates on the autopilot
    component the same way). Also: a truncated tail (router killed
    mid-write) yields the recoverable prefix, not an exception."""
    from sde4mbrl_px4_tpu.io.router import FrameLog, read_tlog

    path = str(tmp_path / "gcs.tlog")
    fl = FrameLog(path, mode="while-armed")
    fl.log(_heartbeat(True))                       # autopilot arms
    fl.log(mav.encode_full_state(1, np.zeros(13, np.float32)))
    fl.log(_heartbeat(False, compid=190))          # QGC heartbeat: ignored
    fl.log(mav.encode_full_state(2, np.zeros(13, np.float32)))
    fl.log(_heartbeat(False))                      # autopilot disarms
    fl.log(mav.encode_full_state(3, np.zeros(13, np.float32)))
    fl.close()
    times = [int(m.time_usec) for _, f in read_tlog(path)
             if (m := mav.decode_frame(f)) is not None]
    assert times == [1, 2]

    # truncated mid-record: clean stop after the intact prefix
    data = open(path, "rb").read()
    trunc = str(tmp_path / "trunc.tlog")
    open(trunc, "wb").write(data[:-7])
    n_full = sum(1 for _ in read_tlog(path))
    n_trunc = sum(1 for _ in read_tlog(trunc))
    assert n_trunc == n_full - 1


def test_native_while_armed_matches_twin(tmp_path):
    """The C++ arm-gating decodes HEARTBEAT the same way the twin does."""
    from sde4mbrl_px4_tpu.io.mavlink import load_native
    from sde4mbrl_px4_tpu.io.router import NativeRouter, read_tlog

    lib = load_native()
    if lib is None or not hasattr(lib, "router_set_log"):
        pytest.skip("native router logging not built (make -C csrc)")
    log_dir = str(tmp_path / "nat")
    fcu = Endpoint("PX4", "127.0.0.1", 0, mode="Server")
    r = NativeRouter([fcu, Endpoint("sink", "127.0.0.1", 1)],
                     log_dir=log_dir, log_mode="while-armed")
    r.start()
    port = r.bound_port("PX4")
    cl = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cl.sendto(mav.encode_full_state(1, np.zeros(13, np.float32)),
              ("127.0.0.1", port))
    cl.sendto(_heartbeat(True), ("127.0.0.1", port))
    cl.sendto(mav.encode_full_state(2, np.zeros(13, np.float32)),
              ("127.0.0.1", port))
    cl.sendto(_heartbeat(False), ("127.0.0.1", port))
    cl.sendto(mav.encode_full_state(3, np.zeros(13, np.float32)),
              ("127.0.0.1", port))
    deadline = time.time() + 3.0
    while r.frames_logged < 2 and time.time() < deadline:
        time.sleep(0.05)
    assert r.frames_logged == 2
    r.stop()
    cl.close()
    logs = [f for f in os.listdir(log_dir) if f.endswith(".tlog")]
    times = [int(m.time_usec)
             for _, f in read_tlog(os.path.join(log_dir, logs[0]))
             if (m := mav.decode_frame(f)) is not None]
    assert times == [2]


def test_native_router_safe_after_stop():
    """stats/bound_port after stop() must not touch the freed native handle
    (previously passed NULL into C and segfaulted)."""
    from sde4mbrl_px4_tpu.io.mavlink import load_native
    from sde4mbrl_px4_tpu.io.router import NativeRouter

    lib = load_native()
    if lib is None or not hasattr(lib, "router_new"):
        pytest.skip("native router not built (make -C csrc)")
    r = NativeRouter([Endpoint("a", "127.0.0.1", 0, mode="Server")])
    r.start()
    assert r.stats["a"] == 0
    r.stop()
    assert r.stats == {"a": -1}
    with pytest.raises(RuntimeError):
        r.bound_port("a")
    r.stop()  # idempotent


def test_tlog_to_flight_log_and_render(tmp_path):
    """Router flight logs feed the SAME analysis pipeline as npz/ulg: the
    .tlog decodes into the flight-log schema (states on the vehicle time
    base, commands sample-and-held) and tools/analyze.py renders it."""
    from sde4mbrl_px4_tpu.io.router import FrameLog
    from sde4mbrl_px4_tpu.io.flight_log import tlog_to_flight_log

    path = str(tmp_path / "flight.tlog")
    fl = FrameLog(path, mode="always")
    for k in range(30):
        if k == 10:
            fl.log(mav.encode_motors_cmd(
                10_000_000, [0.6] * 4, [0.6, 0.1, -0.1, 0.0], 5, 100))
        st = np.zeros(13, np.float32)
        st[0] = 0.1 * k
        st[6] = 1.0
        fl.log(mav.encode_full_state(int(1e6 * (1 + 0.02 * k)), st, seq=k))
    fl.close()

    d = tlog_to_flight_log(path)
    assert d["state"].shape == (30, 13)
    np.testing.assert_allclose(d["t"][0], 1.0, atol=1e-6)
    # commands before the first MPC_MOTORS_CMD are zero, held afterwards
    assert np.all(d["cmd_motors"][:10] == 0.0)
    np.testing.assert_allclose(d["cmd_motors"][10:, :4], 0.6, atol=1e-6)
    assert np.all(d["mpc_on"][10:] == 5)

    import subprocess
    import sys

    out = str(tmp_path / "flight.png")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "analyze.py"),
         path, "-o", out],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(out)


def test_deframer_crc_resync_on_corrupt_length():
    """A corrupted LENGTH byte on a known-dialect frame must cost one
    frame, not the good frames its fake length would swallow: the
    deframer CRC-checks known msgids and resyncs at magic+1 on failure
    (mavlink-routerd semantics)."""
    from sde4mbrl_px4_tpu.io.router import Deframer

    f1 = bytes(mav.encode_full_state(1, np.zeros(13, np.float32), seq=1))
    f2 = bytes(mav.encode_full_state(2, np.ones(13, np.float32), seq=2))
    corrupt = bytearray(f1)
    corrupt[1] += 7                     # fake length: would eat into f2
    d = Deframer()
    out = d.feed(bytes(corrupt) + f2 + f2)
    # the corrupted frame is dropped, BOTH following frames recovered
    assert out.count(f2) == 2
    assert bytes(corrupt) not in out

    # unknown-dialect frames (no crc_extra known) still pass through
    v1_unknown = bytes([0xFE, 3, 0, 1, 1, 99, 7, 7, 7, 0xAB, 0xCD])
    assert Deframer().feed(v1_unknown) == [v1_unknown]


def test_uart_corrupt_length_native(uart_topology):
    """Same corrupted-length recovery through the NATIVE (or py) router's
    serial leg: the following good frame still reaches the UDP peer."""
    import os

    r, master, mpc_sock, mpc_port = uart_topology
    good = bytes(mav.encode_full_state(42, np.zeros(13, np.float32)))
    corrupt = bytearray(good)
    corrupt[1] += 5
    os.write(master, bytes(corrupt) + good)
    got, _ = mpc_sock.recvfrom(512)
    assert got == good
