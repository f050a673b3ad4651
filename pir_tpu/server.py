"""Server-side secret-shared query engines (reference: db.go L2 layer).

Two interchangeable backends answer the same queries bit-for-bit:

* ``host``  — vectorised numpy + AES-NI (via OpenSSL ECB). The golden
  engine; also a strong CPU baseline (full-domain O(H) expansion instead
  of the reference's O(H log H) per-row tree walks).
* ``device`` — JAX/TPU: bitsliced full-domain DPF expansion
  (dpf/device.py) fused with a masked-XOR VPU scan (ops/scan.py).

The reference's goroutine ``nprocs`` fan-out (db.go:110-174) is replaced
by data-parallel lanes; there is no semantic equivalent of nprocs.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

import numpy as np

from .database import Database
from .dpf import host as dpf_host
from .query import QueryShare, SecretSharedQueryResult
from .slot import Slot
from .utils import pad_tile


_MISS = object()  # cache-miss sentinel (None is a legitimate cached value)


def _dims(db: Database, query: QueryShare) -> tuple[int, int]:
    """(dim_width, dim_height) per db.go:78-80: G and DBSize // G."""
    return query.group_size, db.db_size // query.group_size


def _server_dpf(db: Database, query: QueryShare) -> dpf_host.Dpf:
    from .utils.bits import num_bits_for_height

    dim_height = db.db_size // query.group_size
    num_bits = 32 if query.is_keyword_based else num_bits_for_height(dim_height)
    return dpf_host.server_initialize(query.prf_keys, num_bits)


def validate_fast_key_geometry(key_fast, dim_height: int) -> None:
    """Reject fast keys whose geometry disagrees with the database.

    ``depth`` and the leaf width drive expansion and table-layout
    allocations (128 * n_blk << depth flat rows), so a crafted key must
    fail fast instead of driving giant allocations — the same
    remote-DoS class as the served cPIR geometry bound (the analogue of
    db_test.go:211-220 dimension sanity)."""
    lb = key_fast.leaf_bits
    if lb < 128 or lb & (lb - 1):
        raise ValueError("unsupported fast-key leaf width")
    if (key_fast.height != dim_height
            or lb > max(128, 1 << max(0, dim_height - 1).bit_length())
            or key_fast.depth != dpf_host.fast_depth_for_height(dim_height, lb)):
        raise ValueError("fast key geometry does not match the database")


def expand_shared_query(db: Database, query: QueryShare) -> np.ndarray:
    """Host expansion of the DPF into per-row selection bits (db.go:109-174)."""
    dim_height = db.db_size // query.group_size
    if query.key_fast is not None:
        validate_fast_key_geometry(query.key_fast, dim_height)
        pf = dpf_host.server_initialize(query.prf_keys, query.key_fast.depth)
        return dpf_host.eval_full_domain_fast_bits(pf, query.key_fast)
    pf = _server_dpf(db, query)
    if not query.is_two_party:
        points = (
            db.keywords[:dim_height].astype(np.int64)
            if query.is_keyword_based
            else np.arange(dim_height, dtype=np.int64)
        )
        vals = dpf_host.eval_points_mp(pf, query.key_multi_party, points)
        # Multi-party outputs are XOR shares, so the *direct* parity is
        # the selection-bit share: XOR_j (y_j & 1) = [row == target].
        # (The reference's inverted convention at db.go:157-161 belongs
        # to the 2-party +/- sum shares; applied to XOR shares with an
        # odd server count it would select the complement of the target.
        # That code path is unreachable in the reference — keygen panics —
        # so this completes it with the convention that works for any p.)
        return (vals & 1) == 1
    if query.is_keyword_based:
        vals = dpf_host.eval_points(
            pf, query.share_number, query.key_two_party, db.keywords[:dim_height]
        )
        return (vals & 1) == 0
    return dpf_host.eval_full_domain_bits(
        pf, query.share_number, query.key_two_party, dim_height
    )


def private_secret_shared_query_with_expanded_bits(
    db: Database, query: QueryShare, bits: np.ndarray
) -> SecretSharedQueryResult:
    """The XOR scan over selected rows (db.go:74-107), vectorised."""
    dim_width, dim_height = _dims(db, query)
    used = dim_height * dim_width
    rows = db.data[:used].reshape(dim_height, dim_width, db.slot_bytes)
    mask = np.asarray(bits[:dim_height], dtype=bool)
    if mask.any():
        acc = np.bitwise_xor.reduce(rows[mask], axis=0)
    else:
        acc = np.zeros((dim_width, db.slot_bytes), dtype=np.uint8)
    shares = [Slot(acc[c].tobytes()) for c in range(dim_width)]
    return SecretSharedQueryResult(db.slot_bytes, shares)


def private_secret_shared_query(
    db: Database, query: QueryShare
) -> SecretSharedQueryResult:
    """db.go:67-72 (host backend)."""
    bits = expand_shared_query(db, query)
    return private_secret_shared_query_with_expanded_bits(db, query, bits)


class NativePirServer:
    """CPU serving engine backed by the C++/AES-NI library (pir_tpu.native).

    Same query semantics as the host and TPU engines; used where no
    accelerator is attached (and as the client-side keygen's natural
    peer). Requires g++ at first use (builds on demand).
    """

    def __init__(self, db: Database):
        from . import native

        native.load()
        self.db = db

    def expand_shared_query(self, query: QueryShare) -> np.ndarray:
        from . import native
        from .utils.bits import num_bits_for_height

        h = self.db.db_size // query.group_size
        if not query.is_two_party:
            # multi-party expansion has no C++ path yet; the vectorised
            # host eval (AES-NI via OpenSSL, one dispatch per batch of
            # unique rows) answers it with identical semantics
            return expand_shared_query(self.db, query)
        if query.key_fast is not None:
            validate_fast_key_geometry(query.key_fast, h)
            return native.expand_fast_bits(query)
        if query.is_keyword_based:
            return native.eval_point_bits(query, 32, self.db.keywords[:h])
        return native.expand_bits(query, num_bits_for_height(h), h)

    def private_secret_shared_query_with_expanded_bits(
        self, query: QueryShare, bits: np.ndarray
    ) -> SecretSharedQueryResult:
        from . import native

        g = query.group_size
        h = self.db.db_size // g
        rows = self.db.data[: h * g].reshape(h, g * self.db.slot_bytes)
        out = native.scan_xor(rows, bits)
        sb = self.db.slot_bytes
        return SecretSharedQueryResult(
            sb, [Slot(out[c * sb:(c + 1) * sb].tobytes()) for c in range(g)]
        )

    def private_secret_shared_query(self, query: QueryShare) -> SecretSharedQueryResult:
        bits = self.expand_shared_query(query)
        return self.private_secret_shared_query_with_expanded_bits(query, bits)

    def private_secret_shared_query_batch(
        self, queries: list[QueryShare]
    ) -> list[SecretSharedQueryResult]:
        """Answer a uniform batch with ONE cache-blocked pass over the
        table (native.scan_xor_batch) instead of Q streaming scans."""
        from . import native

        if not queries:
            return []
        g = queries[0].group_size
        if any(q.group_size != g for q in queries):
            return [self.private_secret_shared_query(q) for q in queries]
        h = self.db.db_size // g
        bits = np.stack([
            np.ascontiguousarray(self.expand_shared_query(q), dtype=np.uint8)
            for q in queries
        ])
        rows = self.db.data[: h * g].reshape(h, g * self.db.slot_bytes)
        out = native.scan_xor_batch(rows, bits)
        sb = self.db.slot_bytes
        return [
            SecretSharedQueryResult(
                sb, [Slot(out[i, c * sb:(c + 1) * sb].tobytes())
                     for c in range(g)]
            )
            for i in range(len(queries))
        ]


class TpuPirServer:
    """Device-resident PIR server: DB uploaded once, queries answered on TPU.

    Tables and keyword bit-planes are cached per group size; the DPF
    expansion reuses jitted per-width level steps across queries.
    """

    def __init__(self, db: Database, min_device_nodes: int = 32,
                 mxu_batch_threshold: int = 8, mxu_block: int = 8192,
                 plane_table_budget: int = 6 << 30,
                 compat_batch_chunk: int = 8,
                 use_pallas: bool | None = None,
                 # 5 measured fastest at the serving shape: levels 8-12
                 # + leaf run in the Pallas tail at the AES ALU roof,
                 # leaving only the cheap sub-word levels to XLA (r3
                 # sweep, docs/PERFORMANCE.md; 2 was 1.5x slower)
                 pallas_tail_levels: int = 5,
                 compat_pallas_w: int = 128,
                 compat_pallas_max_tail: int = 3,
                 compat_pallas_q_chunk: int = 16,
                 compat_pallas_batch_cap: int = 1024,
                 fast_nonshared_chunk: int = 1024,
                 fast_stacked: bool = True):
        self.db = db
        self.min_device_nodes = min_device_nodes
        self.mxu_batch_threshold = mxu_batch_threshold
        self.mxu_block = mxu_block
        # Pallas kernels (fused AES tail walk + fused unpack/matmul scan)
        # serve fast batches against the storage-ordered raw u8 table:
        # less HBM traffic AND residency than the 8x plane table. Auto-
        # resolves to False off-TPU (CPU pallas_call requires interpret;
        # force use_pallas=True there to exercise the kernels in
        # interpret mode, as tests/test_pallas_expand.py does directly).
        self._use_pallas = use_pallas
        self.pallas_tail_levels = pallas_tail_levels
        # cascaded compat expansion geometry (dpf.device.compat_stage_plan):
        # chunk lane width, per-stage level cap (VMEM bound), lax.map
        # query-chunk size for the intermediate seed-plane buffers.
        self.compat_pallas_w = compat_pallas_w
        self.compat_pallas_max_tail = compat_pallas_max_tail
        self.compat_pallas_q_chunk = compat_pallas_q_chunk
        # batches dispatch in slices padded to power-of-two multiples of
        # q_chunk, capped here, so the set of compiled shapes is bounded
        # (remote compiles cost minutes; see CLAUDE.md)
        self.compat_pallas_batch_cap = compat_pallas_batch_cap
        # planes tables are 8x the packed table; the budget must leave
        # HBM headroom for XLA operand repacks (observed ~2x transient on
        # the int8 matmul operand), hence the conservative default.
        self.plane_table_budget = plane_table_budget
        # compat expansion holds ~32x more VMEM/HBM intermediates per
        # query than fast mode; large vmapped batches OOM, so compat
        # batches run in chunks of this size.
        self.compat_batch_chunk = compat_batch_chunk
        # a fast batch whose shares carry DISTINCT PRF keys (multi-tenant
        # serving) materialises per-query round-key operands — lane-dense
        # (S,11,8,3,16,W) per-grid-step masks on the stacked path
        # (~3.7 MB per 16-query step), ~2 MiB/query of tile padding on
        # the per-query-tail path — so such batches run in chunks of
        # this size; same-key batches (batch keygen) share one mask
        # expansion and run whole.
        self.fast_nonshared_chunk = fast_nonshared_chunk
        # fast batches route through the STACKED tail kernel (k queries
        # per grid step, branches on a leading chunk axis — full-tile
        # AES at every level; models/pipeline.
        # fused_fast_root_batch_stacked_fn) against ONE chunk-major
        # storage table for both key styles: batch-shared keys broadcast
        # one rk mask set, distinct-key (multi-tenant) batches regroup
        # per-query rk lane-dense per step. False = the r3 per-query
        # tail + classic bit-reversed table for everything (A/B).
        self.fast_stacked = fast_stacked
        self._plane_tables: dict[int, object] = {}
        self._storage_cache: dict[tuple, tuple] = {}
        self._tables: dict[int, tuple] = {}
        self._tables_u8: dict[int, object] = {}
        self._kw_planes: dict[int, object] = {}
        self._perms: dict[tuple, object] = {}
        # table/plane population runs under a lock: the TCP service wraps
        # this server in a ThreadingTCPServer, and two concurrent first
        # queries must not upload the same (possibly GiB-sized) table twice
        self._cache_lock = threading.RLock()

    def _cached(self, store: dict, key, build):
        """Double-checked cache population (None is a valid cached value)."""
        val = store.get(key, _MISS)
        if val is _MISS:
            with self._cache_lock:
                val = store.get(key, _MISS)
                if val is _MISS:
                    val = build()
                    store[key] = val
        return val

    def _plane_table(self, group_size: int):
        """Precomputed bit-plane table for the one-matmul batched scan,
        or None if it would exceed the memory budget."""

        def build():
            h = self.db.db_size // group_size
            row_bytes = group_size * self.db.slot_bytes
            if h * row_bytes * 8 > self.plane_table_budget:
                return None
            import jax.numpy as jnp

            from .ops.matmul_scan import make_plane_table

            rows = self.db.data[: h * group_size].reshape(h, row_bytes)
            return jnp.asarray(make_plane_table(rows))

        return self._cached(self._plane_tables, group_size, build)

    def _root_plane_table(self, group_size: int, depth: int, n_blk: int = 1):
        """Storage-ordered (bit-reversed leaves) plane table for the
        root-start batched path; None if over the memory budget.
        ``n_blk`` = leaf width in 128-bit blocks (wide-leaf fast keys)."""

        def build():
            import jax.numpy as jnp

            from .dpf.device import (
                _fast_leaf_perm_root,
                scatter_rows_to_storage_order,
            )
            from .ops.matmul_scan import make_plane_table

            h = self.db.db_size // group_size
            row_bytes = group_size * self.db.slot_bytes
            flat = (128 * n_blk) << depth
            if flat * row_bytes * 8 > self.plane_table_budget:
                return None
            perm = _fast_leaf_perm_root(depth, h, n_blk)
            rows = self.db.data[: h * group_size].reshape(h, row_bytes)
            sc = scatter_rows_to_storage_order(rows, perm, flat)
            return jnp.asarray(make_plane_table(sc))

        return self._cached(
            self._storage_cache, ("root", group_size, depth, n_blk), build
        )

    def _compat_root_plane_table(self, group_size: int, num_bits: int):
        """Bit-reversed-row plane table for the batched compat path.

        `num_bits` is the DEVICE domain (post left-child skip — see
        dpf.device.CompatRootLayout)."""

        def build():
            import jax.numpy as jnp

            from .dpf.device import (
                _compat_leaf_perm_root,
                scatter_rows_to_storage_order,
            )
            from .ops.matmul_scan import make_plane_table

            h = self.db.db_size // group_size
            row_bytes = group_size * self.db.slot_bytes
            flat = 1 << num_bits
            if flat * row_bytes * 8 > self.plane_table_budget:
                return None
            perm = _compat_leaf_perm_root(num_bits, h)
            rows = self.db.data[: h * group_size].reshape(h, row_bytes)
            sc = scatter_rows_to_storage_order(rows, perm, flat)
            return jnp.asarray(make_plane_table(sc))

        return self._cached(
            self._storage_cache, ("compat_root", group_size, num_bits), build
        )

    def _compat_root_table_u8(self, group_size: int, device_bits: int,
                              w: int, tails: tuple[int, ...]):
        """Storage-ordered raw u8 table for the cascaded Pallas compat
        path (rows scattered by the stacked-chunk walk order)."""

        def build():
            import jax.numpy as jnp

            from .dpf.device import (
                _compat_perm_pallas,
                scatter_rows_to_storage_order,
            )
            from .ops.matmul_scan import pad_rows_u8

            h = self.db.db_size // group_size
            row_bytes = group_size * self.db.slot_bytes
            flat = 1 << device_bits
            perm = _compat_perm_pallas(device_bits, h, w, tails)
            rows = self.db.data[: h * group_size].reshape(h, row_bytes)
            sc = scatter_rows_to_storage_order(rows, perm, flat)
            return jnp.asarray(pad_rows_u8(sc, min(2048, flat)))

        return self._cached(
            self._storage_cache,
            ("compat_u8", group_size, device_bits, w, tails), build
        )

    def _root_table_u8(self, group_size: int, depth: int, n_blk: int = 1,
                       stacked: bool = False):
        """Storage-ordered raw u8 table for the gather-free streaming MXU
        fast path (1 GiB+ tables where the plane table is over budget).
        ``n_blk`` = leaf width in 128-bit blocks (wide-leaf fast keys);
        ``stacked`` = the chunk-major flat order of the stacked tail
        kernel (models/pipeline.fused_fast_root_batch_stacked_fn)."""
        if stacked:
            from .models.pipeline import stacked_fast_geometry

            tail = stacked_fast_geometry(depth, n_blk)[1]
            key = ("root_u8s", group_size, depth, n_blk, tail)
        else:
            tail = None
            key = ("root_u8", group_size, depth, n_blk)

        def build():
            import jax.numpy as jnp

            from .dpf.device import (
                _fast_leaf_perm_root,
                _fast_leaf_perm_root_stacked,
                scatter_rows_to_storage_order,
            )
            from .ops.matmul_scan import pad_rows_u8

            h = self.db.db_size // group_size
            row_bytes = group_size * self.db.slot_bytes
            flat = (128 * n_blk) << depth
            perm = (_fast_leaf_perm_root_stacked(depth, h, n_blk, tail)
                    if stacked else _fast_leaf_perm_root(depth, h, n_blk))
            rows = self.db.data[: h * group_size].reshape(h, row_bytes)
            sc = scatter_rows_to_storage_order(rows, perm, flat)
            return jnp.asarray(pad_rows_u8(sc, self.mxu_block))

        return self._cached(self._storage_cache, key, build)

    def _storage_tables(self, group_size: int, dkey):
        """Storage-ordered tables for the gather-free fast path: returns
        (planes_i8 (flat, 8B) or None, words_u32 (flat, C)). Cached per
        (group size, expansion geometry)."""
        d, mp = dkey.plan.device_levels, dkey.plan.m_padded

        n_blk = dkey.fcw_masks.shape[1] if dkey.fcw_masks.ndim == 4 else 1

        def build():
            import jax.numpy as jnp

            from .dpf.device import (
                _fast_leaf_perm,
                scatter_rows_to_storage_order,
            )

            h = self.db.db_size // group_size
            flat = (mp << d) * 128 * n_blk
            perm = _fast_leaf_perm(d, h, mp, n_blk)
            row_bytes = group_size * self.db.slot_bytes
            rows = self.db.data[: h * group_size].reshape(h, row_bytes)
            sc_rows = scatter_rows_to_storage_order(rows, perm, flat)
            # u32 word table only (the batched MXU path uses _root_plane_table)
            arr = np.zeros((flat, group_size, -(-self.db.slot_bytes // 4) * 4),
                           dtype=np.uint8)
            arr[:, :, : self.db.slot_bytes] = sc_rows.reshape(
                flat, group_size, self.db.slot_bytes
            )
            words = jnp.asarray(arr.view("<u4").reshape(flat, -1))
            return (None, words)

        return self._cached(
            self._storage_cache, (group_size, d, mp, n_blk), build
        )

    def _table_u8(self, group_size: int):
        """uint8 row-major table padded for the MXU bit-plane scan."""

        def build():
            import jax.numpy as jnp

            from .ops.matmul_scan import pad_rows_u8

            h = self.db.db_size // group_size
            rows = self.db.data[: h * group_size].reshape(
                h, group_size * self.db.slot_bytes
            )
            return jnp.asarray(pad_rows_u8(rows, self.mxu_block))

        return self._cached(self._tables_u8, group_size, build)

    def _table(self, group_size: int):
        def build():
            import jax.numpy as jnp

            from .ops.scan import pack_table_u32

            h = self.db.db_size // group_size
            tbl = pack_table_u32(self.db.data, h, group_size)
            return (jnp.asarray(tbl), h)

        return self._cached(self._tables, group_size, build)

    # ---- live updates ----

    def _packed_u32_rows(self, group_size: int, rows: np.ndarray) -> np.ndarray:
        from .ops.scan import pack_rows_u32

        return pack_rows_u32(self.db.data, rows, group_size,
                             self.db.slot_bytes)

    def apply_updates(self, updates: dict[int, bytes]) -> None:
        """Apply live slot updates to every device-resident table.

        The reference rebuilds its DB per run (SURVEY.md §5); a serving
        deployment must update rows without re-uploading multi-GiB
        tables or restarting. All cached layouts derive row-wise from
        ``db.data`` (optionally permuted into storage order), so each is
        patched with one device row-scatter: O(changed rows) transfer,
        not O(table). Queries concurrent with the patch see the old or
        the new row atomically per table (the scatter swaps whole
        buffers, and ``db.data`` swaps copy-on-write for the tiny-domain
        host-fallback paths that scan it directly); keyword bit-planes
        are untouched (they derive from ``db.keywords``, which updates
        leave as-is)."""
        import jax.numpy as jnp

        from .dpf.device import (
            _compat_leaf_perm_root,
            _compat_perm_pallas,
            _fast_leaf_perm,
            _fast_leaf_perm_root,
        )
        from .ops.matmul_scan import make_plane_table

        with self._cache_lock:
            self.db.update_slots(updates, copy_on_write=True)
            idxs = np.unique(
                np.fromiter((int(i) for i in updates), dtype=np.int64,
                            count=len(updates))
            )
            sb = self.db.slot_bytes

            def rows_for(g):
                h = self.db.db_size // g
                r = np.unique(idxs // g)
                return r[r < h]

            def raw_rows(g, rows):
                h = self.db.db_size // g
                return self.db.data[: h * g].reshape(h, g * sb)[rows]

            def patched(table, pos, vals):
                return jnp.asarray(table).at[jnp.asarray(pos)].set(
                    jnp.asarray(vals)
                )

            for g in list(self._tables_u8):
                r = rows_for(g)
                if len(r):
                    self._tables_u8[g] = patched(
                        self._tables_u8[g], r, raw_rows(g, r)
                    )
            for g in list(self._plane_tables):
                if self._plane_tables[g] is None:
                    continue
                r = rows_for(g)
                if len(r):
                    self._plane_tables[g] = patched(
                        self._plane_tables[g], r,
                        make_plane_table(raw_rows(g, r)),
                    )
            for g, (tbl, h) in list(self._tables.items()):
                r = rows_for(g)
                if len(r):
                    self._tables[g] = (
                        patched(tbl, r, self._packed_u32_rows(g, r)), h
                    )
            for key, val in list(self._storage_cache.items()):
                if val is None:  # over-budget plane table marker
                    continue
                kind = key[0] if isinstance(key[0], str) else "words"
                g = key[1] if kind != "words" else key[0]
                h = self.db.db_size // g
                r = rows_for(g)
                if not len(r):
                    continue
                if kind == "root_u8":
                    perm = _fast_leaf_perm_root(key[2], h, key[3])
                    self._storage_cache[key] = patched(
                        val, perm[r], raw_rows(g, r)
                    )
                elif kind == "root_u8s":  # stacked-tail flat order
                    from .dpf.device import _fast_leaf_perm_root_stacked

                    perm = _fast_leaf_perm_root_stacked(
                        key[2], h, key[3], key[4])
                    self._storage_cache[key] = patched(
                        val, perm[r], raw_rows(g, r)
                    )
                elif kind == "root":
                    perm = _fast_leaf_perm_root(key[2], h, key[3])
                    self._storage_cache[key] = patched(
                        val, perm[r], make_plane_table(raw_rows(g, r))
                    )
                elif kind == "compat_u8":
                    perm = _compat_perm_pallas(key[2], h, key[3], key[4])
                    self._storage_cache[key] = patched(
                        val, perm[r], raw_rows(g, r)
                    )
                elif kind == "compat_root":
                    perm = _compat_leaf_perm_root(key[2], h)
                    self._storage_cache[key] = patched(
                        val, perm[r], make_plane_table(raw_rows(g, r))
                    )
                else:  # (g, d, mp, n_blk) -> (None, u32 word table)
                    perm = _fast_leaf_perm(key[1], h, key[2], key[3])
                    self._storage_cache[key] = (
                        val[0],
                        patched(val[1], perm[r], self._packed_u32_rows(g, r)),
                    )

    def _perm(self, num_bits: int, height: int):
        """Device-resident leaf permutation, shared across queries."""

        def build():
            import jax.numpy as jnp

            from .dpf.device import _leaf_perm

            return jnp.asarray(
                _leaf_perm(num_bits, height, self.min_device_nodes)
            )

        return self._cached(
            self._perms, (num_bits, height, self.min_device_nodes), build
        )

    def _index_payload(self, query: QueryShare, height: int):
        from .dpf.device import (
            make_device_fast_key,
            make_device_key,
            pack_fast_payload,
            pack_key_payload,
        )

        if query.key_fast is not None:
            validate_fast_key_geometry(query.key_fast, height)
            pf = dpf_host.server_initialize(query.prf_keys, query.key_fast.depth)
            dkey = make_device_fast_key(pf, query.key_fast, self.min_device_nodes)
            if dkey.host_bits is not None:
                return None, None, dkey
            payload, layout = pack_fast_payload(dkey)
            return payload, layout, dkey
        pf = _server_dpf(self.db, query)
        dkey = make_device_key(
            pf, query.key_two_party, height, self.min_device_nodes
        )
        if dkey.host_bits is not None:
            return None, None, dkey
        payload, layout = pack_key_payload(dkey)
        return payload, layout, dkey

    def _fast_perm(self, dkey):
        """Device-resident fast-mode leaf permutation (shared per shape)."""
        n_blk = dkey.fcw_masks.shape[1] if dkey.fcw_masks.ndim == 4 else 1

        def build():
            import jax.numpy as jnp

            from .dpf.device import _fast_leaf_perm

            return jnp.asarray(
                _fast_leaf_perm(dkey.plan.device_levels, dkey.height,
                                dkey.plan.m_padded, n_blk)
            )

        key = ("fast", dkey.plan.device_levels, dkey.height,
               dkey.plan.m_padded, n_blk)
        return self._cached(self._perms, key, build)

    def _kw_plane_table(self, group_size: int, height: int):
        """Device-resident keyword bit-planes, shared across queries."""

        def build():
            from .dpf import device as dev

            return dev.pack_point_bit_planes(self.db.keywords[:height], 32)

        return self._cached(self._kw_planes, group_size, build)

    def expand_shared_query(self, query: QueryShare):
        """Device DPF expansion -> (H,) uint8 bits (device array)."""
        from .dpf import device as dev

        _, h = self._table(query.group_size)
        if query.key_fast is not None:
            payload, layout, dkey = self._index_payload(query, h)
            if payload is None:
                return dkey.host_bits
            from .models.pipeline import fused_fast_bits_fn

            return fused_fast_bits_fn(layout)(payload, self._fast_perm(dkey))
        if not query.is_two_party:
            # bitsliced device eval of the sigma-slot PRG walk
            # (dpf/server.go:110-144 semantics; dpf/device.py MP
            # section) — no host expansion on the serving path
            pf = _server_dpf(self.db, query)
            if not query.is_keyword_based:
                return dev.expand_mp_full_domain_bits(
                    pf, query.key_multi_party, h
                )
            # keyword MP: arbitrary-point device eval (one PRG block
            # per sigma slot per row; db.go:132-135 with >=3 servers)
            return dev.eval_points_mp_bits(
                pf, query.key_multi_party, self.db.keywords[:h]
            )
        pf = _server_dpf(self.db, query)
        if query.is_keyword_based:
            planes = self._kw_plane_table(query.group_size, h)
            dkey = dev.make_device_point_key(pf, query.key_two_party)
            return dev.eval_points_bits(dkey, planes, h)
        dkey = dev.make_device_key(
            pf, query.key_two_party, h, self.min_device_nodes
        )
        return dev.expand_query_bits(dkey)

    def private_secret_shared_query_with_expanded_bits(
        self, query: QueryShare, bits
    ) -> SecretSharedQueryResult:
        from .ops.scan import masked_xor_scan, unpack_result_u32

        table, h = self._table(query.group_size)
        res = masked_xor_scan(table, bits)
        out = unpack_result_u32(np.asarray(res), query.group_size, self.db.slot_bytes)
        return SecretSharedQueryResult(
            self.db.slot_bytes, [Slot(out[c].tobytes()) for c in range(out.shape[0])]
        )

    def _result_from_words(self, res_words, group_size: int) -> SecretSharedQueryResult:
        from .ops.scan import unpack_result_u32

        out = unpack_result_u32(np.asarray(res_words), group_size, self.db.slot_bytes)
        return SecretSharedQueryResult(
            self.db.slot_bytes, [Slot(out[c].tobytes()) for c in range(out.shape[0])]
        )

    def _keyword_query_batch(self, queries):
        """Batched keyword-mode answers: one vmapped 32-level DPF walk over
        the keyword array + one batched scan."""
        from .dpf import device as dev
        from .ops.matmul_scan import mxu_preplane_scan

        g = queries[0].group_size
        _, h = self._table(g)
        kw_planes = self._kw_plane_table(g, h)
        dkeys = []
        for query in queries:
            if query.group_size != g or not query.is_two_party:
                raise ValueError("keyword batch requires uniform 2-party queries")
            pf = _server_dpf(self.db, query)
            dkeys.append(dev.make_device_point_key(pf, query.key_two_party))
        bits = dev.eval_points_bits_batch(dkeys, kw_planes, h)  # (Q,H)
        planes = self._plane_table(g)
        sb = self.db.slot_bytes
        if planes is not None:
            out = np.asarray(mxu_preplane_scan(planes, bits))
            return [
                SecretSharedQueryResult(
                    sb, [Slot(out[i, c * sb:(c + 1) * sb].tobytes())
                         for c in range(g)]
                )
                for i in range(len(queries))
            ]
        from .ops.scan import masked_xor_scan_batched

        table, _ = self._table(g)
        res = np.asarray(masked_xor_scan_batched(table, bits))
        return [self._result_from_words(res[i], g) for i in range(len(queries))]

    def private_secret_shared_query(self, query: QueryShare) -> SecretSharedQueryResult:
        """Single-dispatch fused expand+scan for 2-party index queries;
        falls back to expand-then-scan for keyword/multi-party/tiny cases."""
        from .models.pipeline import fused_answer_fn, fused_fast_answer_fn

        h = self.db.db_size // query.group_size
        if query.is_two_party and not query.is_keyword_based:
            if self._fast_root_applicable([query]):
                # singles ride the padded root-start batch path: same
                # compiled Q=threshold executable and same storage-ordered
                # table as batched serving (the old per-query storage-fn
                # path kept a SECOND resident table copy per group size)
                return self.private_secret_shared_query_batch([query])[0]
            payload, layout, dkey = self._index_payload(query, h)
            if payload is not None and query.key_fast is not None:
                from .models.pipeline import fused_fast_answer_storage_fn

                _, words = self._storage_tables(query.group_size, dkey)
                res = fused_fast_answer_storage_fn(layout)(words, payload)
                return self._result_from_words(res, query.group_size)
            if payload is not None:
                table, _ = self._table(query.group_size)
                res = fused_answer_fn(layout)(
                    table, payload, self._perm(dkey.plan.num_bits, h)
                )
                return self._result_from_words(res, query.group_size)
        bits = self.expand_shared_query(query)
        return self.private_secret_shared_query_with_expanded_bits(query, bits)

    def _slice_batch_results(
        self, out: np.ndarray, group_size: int, n: int
    ) -> list[SecretSharedQueryResult]:
        sb = self.db.slot_bytes
        return [
            SecretSharedQueryResult(
                sb,
                [Slot(out[i, c * sb:(c + 1) * sb].tobytes())
                 for c in range(group_size)],
            )
            for i in range(n)
        ]

    def _fast_root_applicable(self, queries: list[QueryShare]) -> bool:
        """Root-start expansion needs >= one full uint32 lane word of
        leaves (depth >= 5); tiny domains answer via host bits instead.
        Batches below mxu_batch_threshold qualify too: _dispatch_fast_root
        pads them to the threshold (one compiled minimum shape), which is
        the single-dispatch small-batch serving path — batch-1 latency is
        one Q=8 dispatch, not a separate per-query executable."""
        q0 = queries[0]
        return (q0.key_fast is not None and not q0.is_keyword_based
                and q0.key_fast.depth >= 5)

    def _compat_device_bits(self, group_size: int) -> int:
        from .dpf.device import compat_skip_levels
        from .utils.bits import num_bits_for_height

        h = self.db.db_size // group_size
        nb = num_bits_for_height(h)
        return nb - compat_skip_levels(nb, h)

    def _compat_pallas_applicable(self, queries: list[QueryShare]) -> bool:
        """The cascaded Pallas compat path needs at least one stage after
        the head walk: device_bits > 5 + log2(w)."""
        import math

        import jax

        q0 = queries[0]
        if (q0.key_fast is not None or q0.is_keyword_based
                or len(queries) < self.mxu_batch_threshold):
            return False
        on_tpu = jax.default_backend() == "tpu"
        use_pallas = self._use_pallas if self._use_pallas is not None else on_tpu
        if not use_pallas:
            return False
        nbd = self._compat_device_bits(q0.group_size)
        return nbd > 5 + int(math.log2(self.compat_pallas_w))

    def _dispatch_compat_pallas(self, queries: list[QueryShare]):
        """Dispatch a uniform compat batch through the cascaded Pallas
        expansion + fused scan; returns a list of (device_array, take)
        slices (async — not yet fetched; assemble with
        ``_assemble_chunked``). Each slice is padded to a power-of-two
        multiple of the lax.map query-chunk size and capped at
        ``compat_pallas_batch_cap``, so the set of compiled shapes is
        bounded at log2(cap/q_chunk)+1 regardless of batch size."""
        import jax

        from .dpf.device import compat_stage_plan, make_compat_payload_batch
        from .models.pipeline import fused_compat_root_batch_pallas_fn

        g = queries[0].group_size
        h = self.db.db_size // g
        nbd = self._compat_device_bits(g)
        w, mt = self.compat_pallas_w, self.compat_pallas_max_tail
        _, tails = compat_stage_plan(nbd, w, mt)
        table = self._compat_root_table_u8(g, nbd, w, tails)
        qc = self.compat_pallas_q_chunk
        cap = max(self.compat_pallas_batch_cap, qc)
        on_tpu = jax.default_backend() == "tpu"
        outs = []
        i = 0
        while i < len(queries):
            part = queries[i:i + cap]
            take = len(part)
            target = qc
            while target < take:
                target *= 2
            if len(part) < target:  # pad by repeating (results sliced off)
                part = pad_tile(part, target)
            pay, lo = make_compat_payload_batch(part, height=h)
            fn = fused_compat_root_batch_pallas_fn(
                lo, w=w, max_tail=mt, q_chunk=qc, interpret=not on_tpu
            )
            outs.append((fn(table, pay), take))
            i += take
        return outs

    def _assemble_chunked(self, outs, group_size: int, n: int):
        """Fetch + concatenate (device_array, take) slices -> results."""
        parts = [np.asarray(dev)[:take] for dev, take in outs]
        out = np.concatenate(parts) if len(parts) > 1 else parts[0]
        return self._slice_batch_results(out, group_size, n)

    @staticmethod
    def _batch_shares_prf_keys(queries: list[QueryShare]) -> bool:
        """True when every share carries the same PRF keys. The batch
        keygen hands every share the SAME key list object, so the common
        single-client case is O(Q) identity checks; byte comparison only
        runs for shares from distinct keygens."""
        p0 = queries[0].prf_keys
        sig0 = None
        for s in queries[1:]:
            if s.prf_keys is p0:
                continue
            if sig0 is None:
                sig0 = tuple(bytes(k.bytes) for k in p0)
            if tuple(bytes(k.bytes) for k in s.prf_keys) != sig0:
                return False
        return True

    def _dispatch_fast_root(self, queries: list[QueryShare],
                            shared_rk: bool | None = None):
        """Dispatch a uniform fast-mode batch through a root-start path;
        returns the (Q, row_bytes) uint8 device array (async — not yet
        fetched). The whole tree expands on device and the host payload
        build is one vectorised pass over the batch (never per-query:
        python-loop host work costs ~0.9 ms/query on the 1-core rig).
        """
        from .dpf.device import make_fast_payload_batch
        from .models.pipeline import (
            fused_fast_root_batch_fn,
            fused_fast_root_batch_mxu_fn,
            fused_fast_root_batch_pallas_fn,
        )

        g = queries[0].group_size
        depth = queries[0].key_fast.depth
        n_blk = queries[0].key_fast.leaf_bits // 128
        cap = self.fast_nonshared_chunk
        if shared_rk is None:
            shared_rk = self._batch_shares_prf_keys(queries)
        # small-batch serving: pad to the threshold so batch sizes
        # 1..threshold-1 share ONE compiled minimum shape; callers slice
        # results to the original count. shared_rk is resolved BEFORE
        # padding (tiling duplicates q0, which must not flip a
        # distinct-key batch to the shared layout). Non-shared batches
        # pad only up to the chunk cap: padding past it would re-enter
        # the chunk split below on its own padding, unboundedly.
        pad_to = (self.mxu_batch_threshold if shared_rk
                  else min(self.mxu_batch_threshold, cap))
        if len(queries) < pad_to:
            queries = pad_tile(queries, pad_to)
        if not shared_rk and len(queries) > cap:
            # distinct-key (multi-tenant) batch: per-query round-key
            # masks OOM HBM at large Q — chunk, padding the tail to
            # keep one compiled shape, and concatenate on device.
            # shared_rk=False is forced on every chunk: a tail tiled
            # from few (or one) queries would otherwise flip the layout
            # to the shared one and compile a fresh shape mid-serving.
            import jax.numpy as jnp

            outs = []
            for s0 in range(0, len(queries), cap):
                part = queries[s0:s0 + cap]
                take = len(part)
                if take < cap:
                    part = pad_tile(part, cap)
                outs.append(
                    self._dispatch_fast_root(part, shared_rk=False)[:take]
                )
            return jnp.concatenate(outs, axis=0)
        pay, root_layout = make_fast_payload_batch(queries, shared_rk=shared_rk)
        import jax

        on_tpu = jax.default_backend() == "tpu"
        use_pallas = self._use_pallas if self._use_pallas is not None else on_tpu
        if use_pallas:
            if self.fast_stacked:
                # one stacked chunk-major table serves BOTH key styles
                # (shared rk broadcast / per-step lane-dense rk) — a
                # mixed-tenancy server holds a single fast table copy
                from .models.pipeline import fused_fast_root_batch_stacked_fn

                return fused_fast_root_batch_stacked_fn(
                    root_layout, interpret=not on_tpu,
                )(self._root_table_u8(g, depth, n_blk, stacked=True), pay)
            return fused_fast_root_batch_pallas_fn(
                root_layout, tail_levels=self.pallas_tail_levels,
                interpret=not on_tpu,
            )(self._root_table_u8(g, depth, n_blk), pay)
        root_planes = self._root_plane_table(g, depth, n_blk)
        if root_planes is not None:
            return fused_fast_root_batch_fn(root_layout)(root_planes, pay)
        return fused_fast_root_batch_mxu_fn(root_layout, self.mxu_block)(
            self._root_table_u8(g, depth, n_blk), pay
        )

    def private_secret_shared_query_batch_async(
        self, queries: list[QueryShare]
    ):
        """Dispatch a batch without waiting for the device; returns a
        zero-arg callable producing the results. On the fast root-start
        paths the device work proceeds asynchronously, so callers can
        pipeline payload builds of the next batch against device compute
        of this one; other paths compute eagerly."""
        self._validate_batch(queries)
        if self._fast_root_applicable(queries):
            out_dev = self._dispatch_fast_root(queries)
            g, n = queries[0].group_size, len(queries)
            return lambda: self._slice_batch_results(np.asarray(out_dev), g, n)
        if self._compat_pallas_applicable(queries):
            outs = self._dispatch_compat_pallas(queries)
            g, n = queries[0].group_size, len(queries)
            return lambda: self._assemble_chunked(outs, g, n)
        res = self.private_secret_shared_query_batch(queries)
        return lambda: res

    def _validate_batch(self, queries: list[QueryShare]) -> None:
        g = queries[0].group_size
        fast = queries[0].key_fast is not None
        if queries[0].is_keyword_based:
            return  # keyword batches validate in _keyword_query_batch
        lb = queries[0].key_fast.leaf_bits if fast else None
        if fast:
            validate_fast_key_geometry(queries[0].key_fast,
                                       self.db.db_size // g)
        for query in queries:
            if query.group_size != g or not query.is_two_party or query.is_keyword_based:
                raise ValueError("batch requires uniform 2-party index queries")
            if (query.key_fast is not None) != fast:
                raise ValueError("batch cannot mix fast and compat queries")
            if fast and query.key_fast.leaf_bits != lb:
                raise ValueError("batch cannot mix fast-key leaf widths")

    def private_secret_shared_query_batch(
        self, queries: list[QueryShare]
    ) -> list[SecretSharedQueryResult]:
        """Answer a batch of same-shape index queries in one dispatch."""
        from .models.pipeline import (
            fused_answer_batch_fn,
            fused_fast_answer_batch_fn,
        )

        g = queries[0].group_size
        fast = queries[0].key_fast is not None
        if queries[0].is_keyword_based:
            return self._keyword_query_batch(queries)
        self._validate_batch(queries)
        h = self.db.db_size // g
        if self._fast_root_applicable(queries):
            out = np.asarray(self._dispatch_fast_root(queries))
            return self._slice_batch_results(out, g, len(queries))
        if (not fast) and len(queries) >= self.mxu_batch_threshold:
            if self._compat_pallas_applicable(queries):
                outs = self._dispatch_compat_pallas(queries)
                return self._assemble_chunked(outs, g, len(queries))
            nbd = self._compat_device_bits(g)
            if nbd >= 5:
                planes = self._compat_root_plane_table(g, nbd)
                if planes is not None:
                    from .dpf.device import make_compat_payload_batch
                    from .models.pipeline import fused_compat_root_batch_fn

                    sb = self.db.slot_bytes
                    chunk = self.compat_batch_chunk
                    starts = list(range(0, len(queries), chunk))
                    outs = []
                    for s0 in starts:  # dispatch all chunks (async)
                        part = queries[s0:s0 + chunk]
                        if len(part) < chunk:  # keep one compiled shape
                            part = pad_tile(part, chunk)
                        pay, lo = make_compat_payload_batch(part, height=h)
                        outs.append(fused_compat_root_batch_fn(lo)(planes, pay))
                    results = []
                    for s0, dev in zip(starts, outs):  # then fetch
                        out = np.asarray(dev)
                        for i in range(min(chunk, len(queries) - s0)):
                            results.append(SecretSharedQueryResult(
                                sb,
                                [Slot(out[i, c * sb:(c + 1) * sb].tobytes())
                                 for c in range(g)],
                            ))
                    return results
        if (not fast) and len(queries) > self.compat_batch_chunk:
            # Compat fallback (root plane table over budget): the vmapped
            # full-depth expansion holds ~200 MB of intermediates per
            # query, so large batches must run in chunks. Pad the tail
            # chunk to keep one compiled shape.
            chunk = self.compat_batch_chunk
            results = []
            for s0 in range(0, len(queries), chunk):
                part = queries[s0:s0 + chunk]
                take = len(part)
                if take < chunk:
                    part = pad_tile(part, chunk)
                results.extend(
                    self.private_secret_shared_query_batch(part)[:take]
                )
            return results
        table, h = self._table(g)
        payloads, layout, last_dkey = [], None, None
        for query in queries:
            p, lo, dkey = self._index_payload(query, h)
            if p is None:
                # tiny domain: no device expansion; answer individually
                return [self.private_secret_shared_query(qq) for qq in queries]
            payloads.append(p)
            layout, last_dkey = lo, dkey
        if fast:
            res = fused_fast_answer_batch_fn(layout)(
                table, np.stack(payloads), self._fast_perm(last_dkey)
            )
        else:
            res = fused_answer_batch_fn(layout)(
                table, np.stack(payloads), self._perm(last_dkey.plan.num_bits, h)
            )
        res = np.asarray(res)
        return [self._result_from_words(res[i], g) for i in range(len(queries))]

    # ---- steady-state overlap serving (fused scan+expand kernel) ----

    def fast_serving_stream(self) -> "FastServingStream":
        """Open a steady-state fast-mode serving stream: submit(k)
        dispatches batch k and returns batch k-1's results (one-batch
        lag); flush() drains the last batch. Batches must be uniform
        (same size, group size, depth).

        Default ("stacked", fast_stacked=True): each batch rides the
        SAME async root-start dispatch as the batch API (the r4 stacked
        tail kernel + chunk-major table), so batch k-1's fetch and the
        host build of batch k+1 overlap batch k's device compute —
        stream throughput matches the pipelined batch path with a
        bounded two-batch device footprint. Supports wide-leaf keys and
        distinct-key (multi-tenant) batches.

        fast_stacked=False keeps the r3 fused scan+expand overlap
        kernel for A/B: batch k's table scan runs in the SAME Pallas
        kernel as batch k+1's DPF expansion (ops/pallas_fused.py) —
        128-bit leaves and batch-shared PRF keys only, measured slower
        than the stacked path at every shape tried (docs/PERFORMANCE.md).
        """
        return FastServingStream(self)


class FastServingStream:
    """See TpuPirServer.fast_serving_stream."""

    def __init__(self, server: TpuPirServer):
        self._srv = server
        self._mode = None  # "stacked" | "fused", decided on first submit
        self._shape = None  # (Q, group, depth) [+ layout in fused mode]
        self._pending = None  # stacked: (out_dev, queries) not yet drained
        self._words = None  # fused: previous batch's packed bits, transposed
        self._prev = None  # fused: previous batch's (queries,) for slicing
        self._step = None
        self._table_key = None

    def _table(self):
        """Resolve the serving table per dispatch (not pinned at stream
        start) so live updates (apply_updates) reach an open stream at
        the next batch — the cache returns the latest patched buffer."""
        return self._srv._root_table_u8(*self._table_key)

    def _check_uniform(self, queries):
        srv = self._srv
        q0 = queries[0]
        if q0.key_fast is None or q0.is_keyword_based:
            raise ValueError("stream serves fast-mode index queries only")
        validate_fast_key_geometry(
            q0.key_fast, srv.db.db_size // q0.group_size
        )
        return (len(queries), q0.group_size, q0.key_fast.depth)

    def _prepare(self, queries):
        import jax

        from .dpf.device import make_fast_payload_batch
        from .models.pipeline import fused_fast_overlap_step_fn

        srv = self._srv
        q0 = queries[0]
        if not srv._batch_shares_prf_keys(queries):
            raise ValueError("stream batches need batch-shared PRF keys")
        pay, layout = make_fast_payload_batch(queries, shared_rk=True)
        shape = (len(queries), q0.group_size, q0.key_fast.depth, layout)
        if self._shape is None:
            on_tpu = jax.default_backend() == "tpu"
            use_pallas = (srv._use_pallas if srv._use_pallas is not None
                          else on_tpu)
            if not use_pallas:
                raise ValueError("stream needs the Pallas serving path "
                                 "(use_pallas=True; interpret off-TPU)")
            self._shape = shape
            # resolved per submit (not pinned) so live updates
            # (apply_updates) reach an open stream at the next batch
            self._table_key = (q0.group_size, q0.key_fast.depth,
                               q0.key_fast.leaf_bits // 128)
            self._step = fused_fast_overlap_step_fn(
                layout, tail_levels=srv.pallas_tail_levels,
                interpret=not on_tpu,
            )
            import jax.numpy as jnp

            self._words = jnp.zeros(
                (self._table().shape[0] // 32, len(queries)), jnp.uint32
            )
        elif shape != self._shape:
            raise ValueError(f"stream batches must keep one shape: "
                             f"{shape[:3]} != {self._shape[:3]}")
        return pay

    def _future(self, out_dev, queries):
        g, n = queries[0].group_size, len(queries)
        return lambda: self._srv._slice_batch_results(
            np.asarray(out_dev), g, n
        )

    def submit(self, queries):
        """Dispatch a batch; returns a zero-arg callable resolving the
        PREVIOUS batch's results (None for the first submit). The fetch
        is deferred so callers can drain a few batches behind the device
        (the dispatch itself is async)."""
        queries = list(queries)
        if self._mode is None:
            self._check_uniform(queries)
            if not self._srv._fast_root_applicable(queries):
                raise ValueError(
                    "stream needs the root-start fast path (depth >= 5)"
                )
            self._mode = "stacked" if self._srv.fast_stacked else "fused"
        if self._mode == "fused":
            pay = self._prepare(queries)
            out_prev, self._words = self._step(self._table(), self._words,
                                               pay)
            prev, self._prev = self._prev, queries
            if prev is None:
                return None
            return self._future(out_prev, prev)
        # stacked: validate BEFORE dispatch so a refused batch leaves the
        # pending one answerable (shape-mismatch recoverability)
        shape = self._check_uniform(queries)
        if self._shape is None:
            self._shape = shape
        elif shape != self._shape:
            raise ValueError(f"stream batches must keep one shape: "
                             f"{shape} != {self._shape}")
        out_dev = self._srv._dispatch_fast_root(queries)
        prev, self._pending = self._pending, (out_dev, queries)
        if prev is None:
            return None
        return self._future(*prev)

    def flush(self):
        """Drain the last submitted batch. Returns that batch's result
        future, or None if the stream is empty. (Fused mode scans it
        with a zero payload riding the expansion side, discarded.)"""
        if self._mode == "stacked":
            if self._pending is None:
                return None
            (out, queries), self._pending = self._pending, None
            self._shape = None
            self._mode = None
            return self._future(out, queries)
        if self._prev is None:
            return None
        q_n, _, _, layout = self._shape
        zeros = np.zeros((q_n, layout.total), dtype=np.uint32)
        out_last, _ = self._step(self._table(), self._words, zeros)
        prev, self._prev = self._prev, None
        self._words = None
        self._shape = None
        self._mode = None
        return self._future(out_last, prev)
