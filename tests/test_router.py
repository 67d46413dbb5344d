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
    General sections) parses like the reference's router_hexa.conf: UDP
    endpoints extracted, non-UDP sections skipped."""
    import os

    eps = parse_conf(open(os.path.join(repo_root, "configs",
                                       "router_hexa.conf")).read())
    assert [e.name for e in eps] == ["fcu", "telemetry", "mpc"]
    assert eps[0].mode == "Server" and eps[0].port == 14550
    mpc = eps[2]
    assert mpc.address == "192.168.1.207" and mpc.port == 14998
    assert mpc.allow_in == {368} and mpc.allow_out == {367}


def test_parse_reference_hexa_conf_uart_ignored():
    """The reference's REAL vehicle conf (UartEndpoint first) loads
    unchanged: the UART section is skipped, the two UDP endpoints survive
    with their filters."""
    import os

    ref = "/root/reference/scripts/router_hexa.conf"
    if not os.path.exists(ref):
        pytest.skip("reference tree not mounted")
    eps = parse_conf(open(ref).read())
    assert [e.name for e in eps] == ["Mavros", "MPC"]
    assert eps[1].allow_in == {368} and eps[1].allow_out == {367}


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
