"""Service shell: PIR server process + client over TCP.

The reference is a library with no network layer (SURVEY.md §0); real
deployments need one, so this provides a minimal length-prefixed TCP
protocol over wire.py messages. Each logical PIR server (share holder)
runs one PirService; the client fans a query's shares out to two (or
more) services and recovers locally. Protocol privacy requires the
services to be non-colluding, as in the reference's threat model.

Frame format: u32 little-endian length ‖ u8 opcode ‖ payload.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

import numpy as np

from . import wire
from .database import Database, DBMetadata
from .query import QueryShare, SecretSharedQueryResult, recover

OP_METADATA = 1
OP_QUERY = 2
OP_QUERY_BATCH = 3
OP_ERROR = 255


def _send_frame(sock: socket.socket, opcode: int, payload: bytes) -> None:
    sock.sendall(struct.pack("<IB", len(payload) + 1, opcode) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("connection closed")
        buf.extend(chunk)
    return bytes(buf)


def _recv_frame(sock: socket.socket) -> tuple[int, bytes]:
    (length,) = struct.unpack("<I", _recv_exact(sock, 4))
    data = _recv_exact(sock, length)
    return data[0], data[1:]


class PirService:
    """One logical PIR server hosting a database share-answering endpoint."""

    def __init__(self, db: Database, host: str = "127.0.0.1", port: int = 0,
                 use_tpu: bool = False):
        self.db = db
        self._tpu_server = None
        if use_tpu:
            from .server import TpuPirServer

            self._tpu_server = TpuPirServer(db)
        self.metrics = {"queries": 0, "bytes_scanned": 0}

        service = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                while True:
                    try:
                        opcode, payload = _recv_frame(self.request)
                    except (ConnectionError, struct.error):
                        return
                    try:
                        resp_op, resp = service._dispatch(opcode, payload)
                    except Exception as e:  # report errors to the client
                        resp_op, resp = OP_ERROR, str(e).encode()
                    _send_frame(self.request, resp_op, resp)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def close(self):
        self._server.shutdown()
        self._server.server_close()

    def _dispatch(self, opcode: int, payload: bytes) -> tuple[int, bytes]:
        if opcode == OP_METADATA:
            return OP_METADATA, wire.serialize_metadata(
                self.db.slot_bytes, self.db.db_size
            )
        if opcode == OP_QUERY_BATCH:
            # payload: u32 count ‖ (u32 len ‖ share)*
            (count,) = struct.unpack_from("<I", payload, 0)
            off = 4
            shares = []
            for _ in range(count):
                (ln,) = struct.unpack_from("<I", payload, off)
                off += 4
                shares.append(wire.deserialize_query_share(payload[off:off + ln]))
                off += ln
            if self._tpu_server is not None:
                results = self._tpu_server.private_secret_shared_query_batch(shares)
            else:
                from . import server as srv

                results = [srv.private_secret_shared_query(self.db, s)
                           for s in shares]
            self.metrics["queries"] += count
            self.metrics["bytes_scanned"] += count * self.db.db_size * self.db.slot_bytes
            blobs = [wire.serialize_shared_result(r) for r in results]
            out = struct.pack("<I", len(blobs)) + b"".join(
                struct.pack("<I", len(b)) + b for b in blobs
            )
            return OP_QUERY_BATCH, out
        if opcode == OP_QUERY:
            share = wire.deserialize_query_share(payload)
            if self._tpu_server is not None:
                res = self._tpu_server.private_secret_shared_query(share)
            else:
                from . import server as srv

                res = srv.private_secret_shared_query(self.db, share)
            self.metrics["queries"] += 1
            self.metrics["bytes_scanned"] += self.db.db_size * self.db.slot_bytes
            return OP_QUERY, wire.serialize_shared_result(res)
        raise ValueError(f"unknown opcode {opcode}")


class PirClient:
    """Client of N non-colluding PIR services."""

    def __init__(self, addresses: list[tuple[str, int]]):
        self._socks = []
        for host, port in addresses:
            s = socket.create_connection((host, port))
            self._socks.append(s)
        self.metadata = self._fetch_metadata()

    def _fetch_metadata(self) -> DBMetadata:
        _send_frame(self._socks[0], OP_METADATA, b"")
        op, payload = _recv_frame(self._socks[0])
        if op == OP_ERROR:
            raise RuntimeError(payload.decode())
        slot_bytes, db_size = wire.deserialize_metadata(payload)
        return DBMetadata(slot_bytes, db_size)

    def query_index(self, index: int, group_size: int = 1):
        """Full private retrieval: keygen, fan out shares, recover."""
        from .query import new_index_query_shares

        shares = new_index_query_shares(
            self.metadata, index, group_size, len(self._socks)
        )
        results = []
        for sock, share in zip(self._socks, shares):
            _send_frame(sock, OP_QUERY, wire.serialize_query_share(share))
        for sock in self._socks:
            op, payload = _recv_frame(sock)
            if op == OP_ERROR:
                raise RuntimeError(payload.decode())
            results.append(wire.deserialize_shared_result(payload))
        return recover(results)

    def query_index_batch(self, indices: list[int], group_size: int = 1,
                          fast: bool = True):
        """Batched retrieval: one round trip per server for all indices."""
        from .query import new_index_query_shares

        per_server: list[list[bytes]] = [[] for _ in self._socks]
        for idx in indices:
            shares = new_index_query_shares(
                self.metadata, idx, group_size, len(self._socks), fast=fast
            )
            for k, share in enumerate(shares):
                per_server[k].append(wire.serialize_query_share(share))
        answers = []
        for sock, blobs in zip(self._socks, per_server):
            payload = struct.pack("<I", len(blobs)) + b"".join(
                struct.pack("<I", len(b)) + b for b in blobs
            )
            _send_frame(sock, OP_QUERY_BATCH, payload)
        for sock in self._socks:
            op, payload = _recv_frame(sock)
            if op == OP_ERROR:
                raise RuntimeError(payload.decode())
            (count,) = struct.unpack_from("<I", payload, 0)
            off = 4
            results = []
            for _ in range(count):
                (ln,) = struct.unpack_from("<I", payload, off)
                off += 4
                results.append(wire.deserialize_shared_result(payload[off:off + ln]))
                off += ln
            answers.append(results)
        return [
            recover([answers[k][i] for k in range(len(self._socks))])
            for i in range(len(indices))
        ]

    def close(self):
        for s in self._socks:
            s.close()
