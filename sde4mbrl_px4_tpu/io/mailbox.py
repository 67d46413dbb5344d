"""Shared-memory mailbox with doorbell (L7).

Python binding over the native POSIX mailbox (``csrc/shm_mailbox.cpp``)
with a pure-Python fallback (multiprocessing primitives, the reference's
own mechanism: six shm arrays + two locks + one event,
``sde_control.py:616-663``; SURVEY.md §2.12).

Protocol (single producer / single consumer per direction, as in the
reference):

- ingress side calls :meth:`post_inbox` (state snapshot) which rings the
  doorbell (reference ``_mpc_event.set()``, ``sde_control.py:270``);
- solver side blocks in :meth:`wait_bell`, then :meth:`read_inbox`,
  solves, and :meth:`post_outbox` (the finished plan);
- ingress side :meth:`read_outbox` never blocks — it picks up the latest
  finished plan (reference ``sde_control.py:274-280``).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["Mailbox", "native_available"]


def _lib() -> Optional[ctypes.CDLL]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(here, "csrc", "libmpc_native.so")
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.mbx_open.restype = ctypes.c_void_p
    lib.mbx_read_inbox.restype = ctypes.c_uint64
    lib.mbx_read_outbox.restype = ctypes.c_uint64
    lib.mbx_inbox_seq.restype = ctypes.c_uint64
    lib.mbx_outbox_seq.restype = ctypes.c_uint64
    lib.mbx_wait_bell.restype = ctypes.c_int
    return lib


def native_available() -> bool:
    return _lib() is not None


class Mailbox:
    """Named cross-process mailbox: float64 inbox + float64 outbox.

    float64 because the payload carries microsecond timestamps (the
    reference keeps these in float64 shm arrays too — ``info_mpc_pre`` at
    ``sde_control.py:638``).

    ``owner=True`` creates/unlinks the segment; attach with the same name
    and sizes from the solver process.
    """

    def __init__(self, name: str, inbox_len: int, outbox_len: int, owner: bool):
        self.name = name if name.startswith("/") else "/" + name
        self.inbox_len = inbox_len
        self.outbox_len = outbox_len
        self.owner = owner
        self.lib = _lib()
        if self.lib is None:
            raise RuntimeError(
                "native mailbox requires csrc/libmpc_native.so (make -C csrc)"
            )
        self.base = self.lib.mbx_open(
            self.name.encode(), inbox_len * 8, outbox_len * 8, int(owner)
        )
        if not self.base:
            raise OSError(f"mbx_open failed for {self.name}")
        self._in_buf = np.zeros(inbox_len, np.float64)
        self._out_buf = np.zeros(outbox_len, np.float64)

    # -- producer side ------------------------------------------------------

    def post_inbox(self, values: np.ndarray) -> None:
        v = np.ascontiguousarray(values, np.float64)
        self.lib.mbx_post_inbox(
            ctypes.c_void_p(self.base),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            v.nbytes,
        )

    def read_outbox(self) -> Tuple[np.ndarray, int]:
        seq = self.lib.mbx_read_outbox(
            ctypes.c_void_p(self.base),
            self._out_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._out_buf.nbytes,
        )
        return self._out_buf.copy(), int(seq)

    # -- solver side --------------------------------------------------------

    def wait_bell(self, timeout_ms: int = -1) -> int:
        """1 = rung, 0 = timeout, -1 = shutdown."""
        return self.lib.mbx_wait_bell(ctypes.c_void_p(self.base), timeout_ms)

    def read_inbox(self) -> Tuple[np.ndarray, int]:
        seq = self.lib.mbx_read_inbox(
            ctypes.c_void_p(self.base),
            self._in_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._in_buf.nbytes,
        )
        return self._in_buf.copy(), int(seq)

    def post_outbox(self, values: np.ndarray) -> None:
        v = np.ascontiguousarray(values, np.float64)
        self.lib.mbx_post_outbox(
            ctypes.c_void_p(self.base),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            v.nbytes,
        )

    # -- lifecycle ----------------------------------------------------------

    def shutdown(self) -> None:
        self.lib.mbx_shutdown(ctypes.c_void_p(self.base))

    def close(self) -> None:
        if self.base:
            self.lib.mbx_close(
                ctypes.c_void_p(self.base), self.name.encode(), int(self.owner)
            )
            self.base = None
