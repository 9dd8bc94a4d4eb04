"""Length-prefixed message transport over TCP sockets.

Wire format: 8-byte big-endian length + payload. Payloads are dicts whose
values are JSON-serializable scalars or numpy arrays; arrays are framed
separately (dtype/shape header + raw bytes) rather than pickled, so the
protocol is safe to expose between mutually untrusted FL participants —
a malicious client must not get a pickle-deserialization gadget on the
server (the Byzantine threat model starts at the transport).
"""

from __future__ import annotations

import io
import json
import socket
import struct
from typing import Any, Dict

import numpy as np

_LEN = struct.Struct(">Q")
MAX_MESSAGE_BYTES = 1 << 32  # 4 GiB guard


def _encode(msg: Dict[str, Any]) -> bytes:
    meta: Dict[str, Any] = {}
    arrays: Dict[str, np.ndarray] = {}
    for k, v in msg.items():
        if isinstance(v, np.ndarray):
            arrays[k] = v
        else:
            meta[k] = v
    buf = io.BytesIO()
    header = {
        "meta": meta,
        "arrays": {
            k: {"dtype": str(a.dtype), "shape": list(a.shape)}
            for k, a in arrays.items()
        },
    }
    hb = json.dumps(header).encode()
    buf.write(_LEN.pack(len(hb)))
    buf.write(hb)
    for k in header["arrays"]:
        buf.write(np.ascontiguousarray(arrays[k]).tobytes())
    return buf.getvalue()


def _decode(payload: bytes) -> Dict[str, Any]:
    (hlen,) = _LEN.unpack_from(payload, 0)
    header = json.loads(payload[_LEN.size : _LEN.size + hlen])
    msg: Dict[str, Any] = dict(header["meta"])
    offset = _LEN.size + hlen
    for k, spec in header["arrays"].items():
        dtype = np.dtype(spec["dtype"])
        shape = tuple(spec["shape"])
        nbytes = int(dtype.itemsize * np.prod(shape)) if shape else dtype.itemsize
        msg[k] = np.frombuffer(
            payload[offset : offset + nbytes], dtype=dtype
        ).reshape(shape)
        offset += nbytes
    return msg


def send_msg(sock: socket.socket, msg: Dict[str, Any]) -> None:
    data = _encode(msg)
    sock.sendall(_LEN.pack(len(data)) + data)


def recv_msg(sock: socket.socket) -> Dict[str, Any]:
    raw_len = _recv_exact(sock, _LEN.size)
    (n,) = _LEN.unpack(raw_len)
    if n > MAX_MESSAGE_BYTES:
        raise ValueError(f"message too large: {n}")
    return _decode(_recv_exact(sock, n))


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    got = 0
    while got < n:
        chunk = sock.recv(min(n - got, 1 << 20))
        if not chunk:
            raise ConnectionError("socket closed mid-message")
        chunks.append(chunk)
        got += len(chunk)
    return b"".join(chunks)
