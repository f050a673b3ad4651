"""Service shell: PIR server process + client over TCP.

The reference is a library with no network layer (SURVEY.md §0); real
deployments need one, so this provides a minimal length-prefixed TCP
protocol over wire.py messages. Each logical PIR server (share holder)
runs one PirService; the client fans a query's shares out to two (or
more) services and recovers locally. Protocol privacy requires the
services to be non-colluding, as in the reference's threat model.
Single-server protocols (cPIR under Paillier, db.go:176-358) talk to
one service only.

Served protocol families:
  * secret-shared index PIR (+ batched), fast and compat DPF modes
  * keyword PIR via DPF over ``db.keywords`` (db.go:119-135)
  * keyword PIR via the sqrt search tree (keyword.go:76-90)
  * single-server cPIR, single-level and recursive (db.go:176-358)

Frame format: u32 little-endian length ‖ u8 opcode ‖ payload.

Engine selection and observability come from ``config.PirConfig`` /
``pick_engine`` and ``utils.metrics.ServerMetrics`` (SURVEY.md §5).
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading

import numpy as np

from . import wire
from .config import PirConfig, pick_engine
from .database import Database, DBMetadata
from .query import QueryShare, SecretSharedQueryResult, recover
from .utils.metrics import ServerMetrics

OP_METADATA = 1
OP_QUERY = 2
OP_QUERY_BATCH = 3
OP_ENCRYPTED_QUERY = 4
OP_ENCRYPTED_QUERY_REC = 5
OP_SQRTST_META = 6
OP_METRICS = 7
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
    """One logical PIR server hosting a database share-answering endpoint.

    ``config`` selects the answer engine (host numpy golden model, native
    C++/AES-NI, or the TPU engine) via ``pick_engine``; ``use_tpu=True``
    is shorthand for ``PirConfig(engine="tpu")``. ``sqrt_st`` additionally
    hosts a keyword sqrt search tree whose second layer doubles as the
    index-PIR database (keyword.go:34-90).
    """

    def __init__(self, db: Database | None = None, host: str = "127.0.0.1",
                 port: int = 0, use_tpu: bool = False,
                 config: PirConfig | None = None, sqrt_st=None):
        if db is None:
            if sqrt_st is None:
                raise ValueError("need a Database or a PrivateSqrtST")
            db = sqrt_st.second_layer
        self.db = db
        self.sqrt_st = sqrt_st
        # with no explicit config the service answers on the host engine;
        # engine="auto" (or use_tpu) opts into accelerator dispatch
        self.config = (config or PirConfig(engine="host")).validate()
        if use_tpu:
            self.config.engine = "tpu"
        self.engine_name = pick_engine(self.config)
        self._engine = None
        if self.engine_name == "tpu":
            from .server import TpuPirServer

            self._engine = TpuPirServer(
                db, min_device_nodes=self.config.min_device_nodes
            )
        elif self.engine_name == "native":
            from .server import NativePirServer

            self._engine = NativePirServer(db)
        self.metrics = ServerMetrics()

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

    # ---- engine dispatch ----

    def _answer(self, share: QueryShare) -> SecretSharedQueryResult:
        if self._engine is not None:
            return self._engine.private_secret_shared_query(share)
        from . import server as srv

        return srv.private_secret_shared_query(self.db, share)

    @staticmethod
    def _batch_uniform(shares: list[QueryShare]) -> bool:
        """Engine batch paths require uniform 2-party shares of one kind;
        anything else (multi-party, mixed modes/group sizes) answers
        per-share so OP_QUERY_BATCH accepts everything OP_QUERY does."""
        s0 = shares[0]
        return all(
            s.is_two_party
            and s.group_size == s0.group_size
            and s.is_keyword_based == s0.is_keyword_based
            and (s.key_fast is not None) == (s0.key_fast is not None)
            for s in shares
        )

    def _answer_batch(self, shares: list[QueryShare]) -> list[SecretSharedQueryResult]:
        from .server import NativePirServer, TpuPirServer

        if not shares:
            return []
        if not self._batch_uniform(shares):
            return [self._answer(s) for s in shares]
        if isinstance(self._engine, TpuPirServer):
            return self._engine.private_secret_shared_query_batch(shares)
        if isinstance(self._engine, NativePirServer):
            return self._engine.private_secret_shared_query_batch(shares)
        return [self._answer(s) for s in shares]

    def _metadata_flags(self) -> int:
        flags = 0
        if getattr(self.db, "keywords", None) is not None:
            flags |= wire.META_HAS_KEYWORDS
        if self.sqrt_st is not None:
            flags |= wire.META_HAS_SQRT_ST
        return flags

    def _dispatch(self, opcode: int, payload: bytes) -> tuple[int, bytes]:
        scan = self.db.db_size * self.db.slot_bytes
        if opcode == OP_METADATA:
            return OP_METADATA, wire.serialize_metadata(
                self.db.slot_bytes, self.db.db_size, self._metadata_flags()
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
            with self.metrics.timed_query(count * scan, n=count):
                results = self._answer_batch(shares)
            blobs = [wire.serialize_shared_result(r) for r in results]
            out = struct.pack("<I", len(blobs)) + b"".join(
                struct.pack("<I", len(b)) + b for b in blobs
            )
            return OP_QUERY_BATCH, out
        if opcode == OP_QUERY:
            share = wire.deserialize_query_share(payload)
            with self.metrics.timed_query(scan):
                res = self._answer(share)
            return OP_QUERY, wire.serialize_shared_result(res)
        if opcode == OP_ENCRYPTED_QUERY:
            from .encrypted import private_encrypted_query

            q = wire.deserialize_encrypted_query(payload)
            with self.metrics.timed_query(scan):
                res = private_encrypted_query(self.db, q)
            return OP_ENCRYPTED_QUERY, wire.serialize_encrypted_result(res)
        if opcode == OP_ENCRYPTED_QUERY_REC:
            from .encrypted import private_doubly_encrypted_query

            q = wire.deserialize_doubly_encrypted_query(payload)
            with self.metrics.timed_query(scan):
                res = private_doubly_encrypted_query(self.db, q)
            return OP_ENCRYPTED_QUERY_REC, wire.serialize_doubly_encrypted_result(res)
        if opcode == OP_SQRTST_META:
            if self.sqrt_st is None:
                raise ValueError("this service hosts no sqrt search tree")
            return OP_SQRTST_META, wire.serialize_sqrt_st_meta(self.sqrt_st)
        if opcode == OP_METRICS:
            summary = dict(self.metrics.summary(), engine=self.engine_name)
            return OP_METRICS, json.dumps(summary).encode()
        raise ValueError(f"unknown opcode {opcode}")


class PirClient:
    """Client of N non-colluding PIR services.

    Single-server flows (cPIR, metrics) address one service by index;
    secret-shared flows fan shares out to all of them.
    """

    def __init__(self, addresses: list[tuple[str, int]]):
        self._socks = []
        for host, port in addresses:
            s = socket.create_connection((host, port))
            self._socks.append(s)
        self._lock = threading.RLock()  # one in-flight request per client
        self._sqrt_st = None
        self.metadata, self.db_flags = self._fetch_metadata()

    def _rpc(self, sock_idx: int, opcode: int, payload: bytes) -> bytes:
        with self._lock:
            sock = self._socks[sock_idx]
            _send_frame(sock, opcode, payload)
            op, resp = _recv_frame(sock)
        if op == OP_ERROR:
            raise RuntimeError(resp.decode())
        if op != opcode:
            raise RuntimeError(f"expected opcode {opcode}, got {op}")
        return resp

    def _fetch_metadata(self) -> tuple[DBMetadata, int]:
        resp = self._rpc(0, OP_METADATA, b"")
        slot_bytes, db_size, flags = wire.deserialize_metadata(resp)
        return DBMetadata(slot_bytes, db_size), flags

    # ---- secret-shared index PIR ----

    def query_index(self, index: int, group_size: int = 1, fast: bool = False):
        """Full private retrieval: keygen, fan out shares, recover."""
        from .query import new_index_query_shares

        shares = new_index_query_shares(
            self.metadata, index, group_size, len(self._socks), fast=fast
        )
        return self._fan_out_recover(shares)

    def _fan_out_recover(self, shares: list[QueryShare]):
        results = []
        with self._lock:
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
        """Batched retrieval: one round trip per server for all indices.
        Fast-mode keygen runs vectorised over the whole batch."""
        from .query import new_index_query_shares_batch

        share_lists = new_index_query_shares_batch(
            self.metadata, list(indices), group_size, len(self._socks),
            fast=fast,
        )
        return self._fan_out_recover_batch(share_lists)

    def _fan_out_recover_batch(self, share_lists):
        """One OP_QUERY_BATCH round trip per server; recover per query."""
        per_server: list[list[bytes]] = [[] for _ in self._socks]
        for shares in share_lists:
            for k, share in enumerate(shares):
                per_server[k].append(wire.serialize_query_share(share))
        answers = []
        with self._lock:
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
                    results.append(
                        wire.deserialize_shared_result(payload[off:off + ln])
                    )
                    off += ln
                answers.append(results)
        return [
            recover([answers[k][i] for k in range(len(self._socks))])
            for i in range(len(share_lists))
        ]

    # ---- keyword PIR ----

    def query_keyword_dpf_batch(self, keywords: list[int],
                                group_size: int = 1):
        """Batched keyword-DPF retrieval: vectorised keygen, one round
        trip per server (server side routes through the batched keyword
        expansion)."""
        from .query import new_keyword_query_shares_batch

        if not (self.db_flags & wire.META_HAS_KEYWORDS):
            raise RuntimeError("service database has no keyword column")
        share_lists = new_keyword_query_shares_batch(
            self.metadata, list(keywords), group_size, len(self._socks)
        )
        return self._fan_out_recover_batch(share_lists)

    def query_keyword_dpf(self, keyword: int, group_size: int = 1):
        """Keyword PIR via DPF over the server's keyword column
        (db.go:119-135): shares select the row whose keyword matches."""
        from .query import new_keyword_query_shares

        if not (self.db_flags & wire.META_HAS_KEYWORDS):
            raise RuntimeError("service database has no keyword column")
        shares = new_keyword_query_shares(
            self.metadata, keyword, group_size, len(self._socks)
        )
        return self._fan_out_recover(shares)

    def sqrt_st_meta(self):
        """Fetch (and cache) the hosted sqrt search tree's first layer."""
        if self._sqrt_st is None:
            if not (self.db_flags & wire.META_HAS_SQRT_ST):
                raise RuntimeError("service hosts no sqrt search tree")
            self._sqrt_st = wire.deserialize_sqrt_st_meta(
                self._rpc(0, OP_SQRTST_META, b"")
            )
        return self._sqrt_st

    def query_keyword(self, key: str, fast: bool = True):
        """Keyword lookup via the hosted sqrt search tree (keyword.go:76-90
        + the client flow of keyword_test.go:58-95).

        Returns (present, global_index, row_slots): one index-PIR query
        with group_size = tree height retrieves the whole candidate
        bucket; the bucket choice leaks only the first-layer boundary
        interval, exactly as in the reference design.
        """
        from .slot import new_slot_from_string

        st = self.sqrt_st_meta()
        row = st.find_bucket(key)
        slots = self.query_index(row, group_size=st.height, fast=fast)
        col = st.find_in_row(slots, key)
        probe = new_slot_from_string(key, len(slots[col].data))
        present = slots[col].equal(probe)
        return present, row * st.width + col, slots

    # ---- single-server cPIR (Paillier) ----

    def query_encrypted(self, row_index: int, sk, pk, group_size: int = 1,
                        server: int = 0):
        """Single-level cPIR (db.go:176-271): retrieves one whole grid row
        from ONE server; returns the row's slots."""
        from . import encrypted as enc

        q = enc.new_encrypted_query(self.metadata, pk, group_size, row_index)
        resp = self._rpc(server, OP_ENCRYPTED_QUERY,
                         wire.serialize_encrypted_query(q))
        res = wire.deserialize_encrypted_result(resp, pk)
        return enc.recover_encrypted(res, sk)

    def query_encrypted_recursive(self, index: int, sk, pk,
                                  group_size: int = 1, server: int = 0):
        """Recursive (doubly-encrypted) cPIR (db.go:273-358): retrieves
        just the group at `index` with O(sqrt N) upload."""
        from . import encrypted as enc

        q = enc.new_doubly_encrypted_query(self.metadata, pk, group_size, index)
        resp = self._rpc(server, OP_ENCRYPTED_QUERY_REC,
                         wire.serialize_doubly_encrypted_query(q))
        res = wire.deserialize_doubly_encrypted_result(resp, pk)
        return enc.recover_doubly_encrypted(res, sk)

    # ---- observability ----

    def get_metrics(self, server: int = 0) -> dict:
        return json.loads(self._rpc(server, OP_METRICS, b""))

    def close(self):
        for s in self._socks:
            s.close()
