"""TCP embedding service: cache/storage served over a socket.

Reference: the C++ engine doubles as an epoll TCP server (accept thread +
10-worker pool, 26 int keys in -> 26x36 floats out,
cache_manager.cpp:61-152,292-385) and there is a standalone in-RAM storage
server (emb_storage/multi_storage_dummy/socket-server.py).  The reference
itself measures its socket as "SLOW (50% of latency)"
(cpp_socket_client.py:132), which is why evstore_tpu's primary transport is
the batched in-process ctypes ABI — this module exists for the
multi-process/remote-storage capability: a feature-parity server with a
BATCHED protocol.

Protocol (little-endian):
  request:  uint32 B, uint32 T, then B*T int64 row ids
  response: uint32 n_floats, then B*T*D float32 rows
One connection handles many requests.  Threaded server (one thread per
connection; the engine lock serializes cache mutation like the reference's
worker pool does).
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Optional

import numpy as np


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


class EmbeddingServer:
    """Serves `engine.request_batch(idx) -> [B, T, D] fp32` over TCP.
    `engine` may be a TieredCache, NativeTieredCache, SimpleCacheFrontend or
    a bare StorageManager (via a small adapter)."""

    def __init__(self, engine, dim: int, host: str = "127.0.0.1",
                 port: int = 0):
        self.engine = engine
        self.dim = dim
        self._lock = threading.Lock()
        self._srv = socket.create_server((host, port))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._threads = []
        self._accept_thread: Optional[threading.Thread] = None

    def start(self):
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()
        return self

    def _accept_loop(self):
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            t = threading.Thread(target=self._serve_conn, args=(conn,),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def _serve_conn(self, conn: socket.socket):
        try:
            while not self._stop.is_set():
                header = _recv_exact(conn, 8)
                B, T = struct.unpack("<II", header)
                raw = _recv_exact(conn, B * T * 8)
                idx = np.frombuffer(raw, np.int64).reshape(B, T)
                with self._lock:
                    rows = self.engine.request_batch(idx)
                payload = np.ascontiguousarray(rows, np.float32).tobytes()
                conn.sendall(struct.pack("<I", len(payload) // 4) + payload)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def stop(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass


class EmbeddingClient:
    """request_batch over the wire (≙ cpp_socket_client.cache_lookup_via_socket,
    but batched)."""

    def __init__(self, host: str, port: int, n_tables: int, dim: int):
        self.n_tables = n_tables
        self.dim = dim
        self.sock = socket.create_connection((host, port))

    def request_batch(self, idx: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(idx, np.int64)
        B, T = idx.shape
        self.sock.sendall(struct.pack("<II", B, T) + idx.tobytes())
        n_floats = struct.unpack("<I", _recv_exact(self.sock, 4))[0]
        raw = _recv_exact(self.sock, n_floats * 4)
        return np.frombuffer(raw, np.float32).reshape(B, T, self.dim)

    def request(self, group_row_ids):
        out = self.request_batch(np.asarray(group_row_ids)[None, :])
        return out[0], None, None

    def close(self):
        self.sock.close()


class StorageAdapter:
    """Expose a bare StorageManager as request_batch (the reference's
    standalone storage server serves raw rows the same way)."""

    def __init__(self, storage, n_tables: int):
        self.storage = storage
        self.n_tables = n_tables

    def request_batch(self, idx: np.ndarray) -> np.ndarray:
        B, T = idx.shape
        keys = [(t, int(idx[b, t])) for b in range(B) for t in range(T)]
        rows = self.storage.get_batch(keys)
        return rows.reshape(B, T, -1)
