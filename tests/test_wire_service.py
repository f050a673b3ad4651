"""Wire-format round-trips and the TCP service shell end-to-end."""

import random

from pir_tpu import wire
from pir_tpu.database import generate_random_db
from pir_tpu.query import new_index_query_shares
from pir_tpu.service import PirClient, PirService
from pir_tpu.slot import Slot


def test_query_share_roundtrip():
    db = generate_random_db(512, 4)
    shares = new_index_query_shares(db.metadata(), 100, 2, 2)
    for s in shares:
        data = wire.serialize_query_share(s)
        back = wire.deserialize_query_share(data)
        assert back.share_number == s.share_number
        assert back.group_size == s.group_size
        assert back.is_two_party and not back.is_keyword_based
        assert back.key_two_party.s_init == s.key_two_party.s_init
        assert back.key_two_party.t_init == s.key_two_party.t_init
        assert back.key_two_party.cw == s.key_two_party.cw
        assert back.key_two_party.final_cw == s.key_two_party.final_cw
        assert [k.bytes for k in back.prf_keys] == [k.bytes for k in s.prf_keys]


def test_metadata_roundtrip():
    data = wire.serialize_metadata(7, 1 << 30)
    assert wire.deserialize_metadata(data) == (7, 1 << 30, 0)
    data = wire.serialize_metadata(7, 1 << 30, wire.META_HAS_KEYWORDS)
    assert wire.deserialize_metadata(data)[2] == wire.META_HAS_KEYWORDS
    # r1 peers sent no flags byte: still decodes, flags default 0
    assert wire.deserialize_metadata(data[:-1]) == (7, 1 << 30, 0)


def test_service_end_to_end():
    """Two non-colluding services + client retrieval over TCP."""
    rng = random.Random(0)
    db = generate_random_db(1 << 9, 8)
    s0 = PirService(db).start()
    s1 = PirService(db).start()
    try:
        client = PirClient([s0.address, s1.address])
        assert client.metadata.db_size == db.db_size
        for _ in range(3):
            idx = rng.randrange(db.db_size)
            res = client.query_index(idx)
            assert Slot(db.data[idx].tobytes()).equal(res[0])
        m = client.get_metrics()
        client.close()
        assert m["queries"] == 3 and m["engine"] == s0.engine_name
        assert s0.metrics.summary()["queries"] == 3
        assert s0.metrics.summary()["p99_ms"] > 0
    finally:
        s0.close()
        s1.close()


def test_fast_query_share_roundtrip():
    db = generate_random_db(1 << 12, 4)
    shares = new_index_query_shares(db.metadata(), 99, 1, 2, fast=True)
    for s in shares:
        back = wire.deserialize_query_share(wire.serialize_query_share(s))
        assert back.key_fast is not None and back.key_two_party is None
        k, bk = s.key_fast, back.key_fast
        assert (bk.s_init, bk.t_init, bk.cw, bk.final_cw_block, bk.depth,
                bk.height) == (k.s_init, k.t_init, k.cw, k.final_cw_block,
                               k.depth, k.height)


def test_service_fast_mode_end_to_end():
    rng = random.Random(1)
    db = generate_random_db(1 << 10, 8)
    s0 = PirService(db).start()
    s1 = PirService(db).start()
    try:
        client = PirClient([s0.address, s1.address])
        from pir_tpu.query import new_index_query_shares as gen
        from pir_tpu.query import recover
        from pir_tpu import wire as w
        from pir_tpu.service import OP_QUERY, _recv_frame, _send_frame

        idx = rng.randrange(db.db_size)
        shares = gen(client.metadata, idx, 1, 2, fast=True)
        for sock, share in zip(client._socks, shares):
            _send_frame(sock, OP_QUERY, w.serialize_query_share(share))
        results = []
        for sock in client._socks:
            op, payload = _recv_frame(sock)
            assert op == OP_QUERY, payload
            results.append(w.deserialize_shared_result(payload))
        res = recover(results)
        assert Slot(db.data[idx].tobytes()).equal(res[0])
        client.close()
    finally:
        s0.close()
        s1.close()


def test_encrypted_query_wire_roundtrip():
    """cPIR query/result over the wire, end-to-end with decryption."""
    from pir_tpu import encrypted as enc
    from pir_tpu.crypto.paillier import keygen

    sk, pk = keygen(128)
    db = generate_random_db(1 << 6, 3)
    query = enc.new_encrypted_query(db.metadata(), pk, 1, 3)
    q2 = wire.deserialize_encrypted_query(wire.serialize_encrypted_query(query))
    assert q2.pk.n == pk.n and q2.db_width == query.db_width
    resp = enc.private_encrypted_query(db, q2)
    r2 = wire.deserialize_encrypted_result(
        wire.serialize_encrypted_result(resp), pk
    )
    res = enc.recover_encrypted(r2, sk)
    for j in range(query.db_width):
        idx = 3 * query.db_width + j
        if idx < db.db_size:
            assert db.slot(idx).equal(res[j])


def test_database_save_load(tmp_path):
    import numpy as np

    db = generate_random_db(128, 7)
    db.set_keywords(np.arange(128, dtype=np.uint64))
    p = str(tmp_path / "db.npz")
    db.save(p)
    from pir_tpu.database import Database

    db2 = Database.load(p)
    assert db2.db_size == 128 and db2.slot_bytes == 7
    assert (db2.data == db.data).all()
    assert (db2.keywords == db.keywords).all()


def test_database_save_load_mmap(tmp_path):
    """mmap_capable checkpoints restore via a read-only memory map (big
    tables resume without a host-RAM copy) and answer queries."""
    import numpy as np

    from pir_tpu import query as q
    from pir_tpu import server as srv
    from pir_tpu.database import Database

    db = generate_random_db(256, 9)
    p = str(tmp_path / "big.npz")
    db.save(p, mmap_capable=True)
    assert (tmp_path / "big.data.npy").exists()
    db2 = Database.load(p, mmap=True)
    assert isinstance(db2.data, np.memmap)
    assert (np.asarray(db2.data) == db.data).all()
    shares = q.new_index_query_shares(db2.metadata(), 42, 1, 2)
    res = q.recover([srv.private_secret_shared_query(db2, s) for s in shares])
    assert db.slot(42).equal(res[0])
    # non-mmap load of the same checkpoint materialises the data
    db3 = Database.load(p)
    assert not isinstance(db3.data, np.memmap)
    assert (db3.data == db.data).all()


def test_service_batch_endpoint():
    rng = random.Random(2)
    db = generate_random_db(1 << 10, 6)
    s0 = PirService(db).start()
    s1 = PirService(db).start()
    try:
        client = PirClient([s0.address, s1.address])
        idxs = [rng.randrange(db.db_size) for _ in range(5)]
        res = client.query_index_batch(idxs)
        for i, r in zip(idxs, res):
            assert Slot(db.data[i].tobytes()).equal(r[0]), i
        client.close()
    finally:
        s0.close()
        s1.close()


def test_multiparty_share_over_tcp():
    """3-server secret-shared PIR end-to-end over real sockets: the wire
    layer round-trips KeyMP shares (completes the reference's dead MP
    path as a served protocol)."""
    import random

    from pir_tpu.service import PirClient, PirService

    rng = random.Random(41)
    db = generate_random_db(1 << 8, 8)
    services = [PirService(db).start() for _ in range(3)]
    try:
        client = PirClient([s.address for s in services])
        for _ in range(3):
            idx = rng.randrange(db.db_size)
            res = client.query_index(idx, fast=False)
            assert bytes(res[0].data) == db.data[idx].tobytes(), idx
        client.close()
    finally:
        for s in services:
            s.close()


def test_key_mp_wire_roundtrip():
    from pir_tpu import wire
    from pir_tpu.dpf import host as dpf

    client = dpf.client_initialize(8)
    keys = dpf.generate_multi_server(client, 77, 1, 3)
    for k in keys:
        blob = wire.serialize_key_mp(k)
        back, used = wire.deserialize_key_mp(memoryview(blob))
        assert used == len(blob)
        assert back.num_parties == k.num_parties
        assert len(back.cw) == len(k.cw)
        for a, b in zip(back.cw, k.cw):
            assert (a == b).all()
        assert back.sigma == k.sigma


def test_key_mp_wire_roundtrip_32bit_domain():
    """Keyword-domain MP keys have num_bits=32 -> n_gamma = 2^16 sigma
    rows; this overflowed the old uint16 count field (ADVICE r2)."""
    from pir_tpu import wire
    from pir_tpu.dpf import host as dpf

    client = dpf.client_initialize(32)
    keys = dpf.generate_multi_server(client, 0xDEADBEEF, 1, 3)
    k = keys[1]
    assert len(k.sigma) == 1 << 16
    blob = wire.serialize_key_mp(k)
    back, used = wire.deserialize_key_mp(memoryview(blob))
    assert used == len(blob)
    assert back.num_parties == k.num_parties
    for a, b in zip(back.cw, k.cw):
        assert (a == b).all()
    assert back.sigma == k.sigma


def test_batch_mixed_shares_falls_back_per_share():
    """OP_QUERY_BATCH must accept everything OP_QUERY does: multi-party
    and mixed-mode batches answer per-share instead of erroring
    (ADVICE r2: engine batch validation must not propagate)."""
    import random
    import struct

    from pir_tpu import wire
    from pir_tpu.query import new_index_query_shares, recover
    from pir_tpu.service import (
        OP_QUERY_BATCH, PirService, _recv_frame, _send_frame,
    )
    import socket

    rng = random.Random(7)
    db = generate_random_db(1 << 8, 8)
    services = [PirService(db).start() for _ in range(3)]
    try:
        idxs = [rng.randrange(db.db_size) for _ in range(3)]
        share_lists = [
            new_index_query_shares(db.metadata(), i, 1, 3, fast=False)
            for i in idxs
        ]
        answers = []
        for k, svc in enumerate(services):
            sock = socket.create_connection(svc.address)
            blobs = [wire.serialize_query_share(sl[k]) for sl in share_lists]
            payload = struct.pack("<I", len(blobs)) + b"".join(
                struct.pack("<I", len(b)) + b for b in blobs
            )
            _send_frame(sock, OP_QUERY_BATCH, payload)
            op, resp = _recv_frame(sock)
            assert op == OP_QUERY_BATCH, resp.decode()
            (count,) = struct.unpack_from("<I", resp, 0)
            off, results = 4, []
            for _ in range(count):
                (ln,) = struct.unpack_from("<I", resp, off)
                off += 4
                results.append(wire.deserialize_shared_result(resp[off:off + ln]))
                off += ln
            answers.append(results)
            sock.close()
        for i, idx in enumerate(idxs):
            res = recover([answers[k][i] for k in range(3)])
            assert bytes(res[0].data) == db.data[idx].tobytes(), idx
    finally:
        for s in services:
            s.close()


def test_keyword_mp_over_tcp():
    """Keyword-based DPF PIR with 3 non-colluding services over real
    sockets (db.go:132-135 with multi-party shares): KeyMP wire formats
    carry the 2^16-row sigma matrix of the 32-bit keyword domain."""
    import random

    import numpy as np

    from pir_tpu.service import PirClient, PirService

    rng = random.Random(83)
    db = generate_random_db(1 << 7, 5)
    db.set_keywords(
        np.array(rng.sample(range(1 << 32), db.db_size), dtype=np.uint64)
    )
    services = [PirService(db).start() for _ in range(3)]
    try:
        client = PirClient([s.address for s in services])
        for _ in range(2):
            row = rng.randrange(db.db_size)
            res = client.query_keyword_dpf(int(db.keywords[row]))
            assert bytes(res[0].data) == db.data[row].tobytes(), row
        client.close()
    finally:
        for s in services:
            s.close()


def test_service_malformed_frames_keep_connection():
    """Unknown opcodes and garbage payloads must come back as OP_ERROR
    frames on a connection that keeps serving (a malformed client must
    not wedge or crash the service thread)."""
    import socket as _socket

    from pir_tpu.service import (
        OP_ERROR,
        OP_METADATA,
        OP_QUERY,
        _recv_frame,
        _send_frame,
    )

    db = generate_random_db(64, 4)
    s = PirService(db).start()
    try:
        sock = _socket.create_connection(s.address)
        try:
            _send_frame(sock, 250, b"junk")  # unknown opcode
            op, _ = _recv_frame(sock)
            assert op == OP_ERROR
            _send_frame(sock, OP_QUERY, b"\x07garbage-not-a-share")
            op, _ = _recv_frame(sock)
            assert op == OP_ERROR
            _send_frame(sock, OP_METADATA, b"")  # still alive
            op, _ = _recv_frame(sock)
            assert op == OP_METADATA
        finally:
            sock.close()
        # a zero-length frame (no opcode byte) is a framing violation:
        # the server closes that connection in an orderly way and keeps
        # accepting new ones
        sock = _socket.create_connection(s.address)
        try:
            import struct as _struct

            sock.sendall(_struct.pack("<I", 0))
            assert sock.recv(1) == b""  # orderly EOF, no crash
        finally:
            sock.close()
        sock = _socket.create_connection(s.address)
        try:
            _send_frame(sock, OP_METADATA, b"")
            op, _ = _recv_frame(sock)
            assert op == OP_METADATA
        finally:
            sock.close()
    finally:
        s.close()
