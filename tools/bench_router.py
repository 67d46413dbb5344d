#!/usr/bin/env python
"""Router forwarding throughput: native C++ core vs Python twin.

Blasts MPC_FULL_STATE frames at the FCU (server) endpoint and counts how
many arrive at a filtered sink per second — the transport-layer hot path
(reference: mavlink-routerd's forwarding loop). Loopback UDP, one producer.

Usage: python tools/bench_router.py [--frames 20000]
"""
import argparse
import os
import socket
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from sde4mbrl_px4_tpu.io import mavlink as mav
from sde4mbrl_px4_tpu.io.router import Endpoint, NativeRouter, Router


def run(impl, n_frames):
    sink = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sink.bind(("127.0.0.1", 0))
    sink.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 22)
    sink.settimeout(0.25)
    eps = [
        Endpoint("fcu", "127.0.0.1", 0, mode="Server"),
        Endpoint("mpc", "127.0.0.1", sink.getsockname()[1],
                 allow_out={367}, allow_in={368}),
    ]
    r = impl(eps)
    r.start()
    fcu_port = (r.bound_port("fcu") if impl is NativeRouter
                else eps[0].bound_port)
    src = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    src.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 1 << 22)
    frame = bytes(mav.encode_full_state(1, np.zeros(13, np.float32)))

    got = 0
    t0 = time.perf_counter()
    t_last = t0  # time of the LAST forwarded frame: the window ends there,
    # not after the fixed drain-silence timeout (which would deflate the
    # fast implementation's rate and compress the speedup toward 1x)
    for k in range(n_frames):
        src.sendto(frame, ("127.0.0.1", fcu_port))
        # drain opportunistically so the sink buffer never overflows
        if k % 64 == 0:
            sink.setblocking(False)
            try:
                while True:
                    sink.recvfrom(512)
                    got += 1
                    t_last = time.perf_counter()
            except BlockingIOError:
                pass
    sink.settimeout(0.25)
    try:
        while True:
            sink.recvfrom(512)
            got += 1
            t_last = time.perf_counter()
    except socket.timeout:
        pass
    dt = max(t_last - t0, 1e-9)
    r.stop()
    src.close()
    sink.close()
    name = impl.__name__
    print(f"{name:13s} {got}/{n_frames} frames forwarded in {dt:.2f}s "
          f"= {got/dt:,.0f} frames/s (loss {(n_frames-got)/n_frames:.1%})",
          flush=True)
    return got / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20000)
    args = ap.parse_args()
    py = run(Router, args.frames)
    nat = run(NativeRouter, args.frames)
    print(f"native/python speedup: {nat/py:.2f}x")


if __name__ == "__main__":
    main()
