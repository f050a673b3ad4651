"""Multi-chip sharding of the PIR answer pipeline.

Mapping of classic parallelism axes onto PIR (SURVEY.md §2.10):

* **tp**  — the database *rows* axis: each device owns a contiguous row
  shard plus the DPF subtree seeds covering exactly those rows, expands
  them locally, scans its table shard, and the per-shard answer shares
  are XOR-combined (the reference's nprocs partial merge, db.go:256-261,
  becomes a cross-device XOR reduction riding ICI).
* **dp**  — the query-batch axis: independent queries on independent
  devices.
* pp/sp/ep have no analogue: there is no pipeline depth, sequence
  dimension, or expert routing in PIR (SURVEY.md §5 long-context note).

The client-side key never changes: sharding is a *server-side* layout
choice (subtree split of the same DPF), invisible to the protocol.
"""

from __future__ import annotations

import functools
import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved across JAX versions
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..dpf import host as dpf_host
from ..dpf.bitslice import blocks_to_planes
from ..dpf.device import _cw_masks, _pack_t, _host_prefix, ExpandPlan, prf_key_masks
from ..models.pipeline import expand_bits_planes
from ..ops.scan import xor_reduce


def make_mesh(n_devices: int | None = None, dp: int = 1) -> Mesh:
    avail = jax.devices()
    n = n_devices or len(avail)
    if n > len(avail):
        raise ValueError(
            f"requested a {n}-device mesh but this process sees only "
            f"{len(avail)} JAX device(s) on platform "
            f"'{avail[0].platform}'. For a virtual multi-device CPU mesh "
            "set XLA_FLAGS=--xla_force_host_platform_device_count=<n> AND "
            "force the cpu platform via jax.config.update('jax_platforms', "
            "'cpu') before first JAX use (the env var alone can be "
            "overridden by site configuration)."
        )
    if dp < 1 or n % dp != 0:
        raise ValueError(f"dp={dp} must be >= 1 and divide n_devices={n}")
    devs = avail[:n]
    tp = n // dp
    return Mesh(np.array(devs).reshape(dp, tp), ("dp", "tp"))


@dataclass
class ShardedKeyArrays:
    """Per-query device arrays split into `n_shards` row shards."""

    seeds: np.ndarray  # (D, 8, 16, NWs)
    t: np.ndarray  # (D, NWs)
    cw_seed_masks: np.ndarray  # (d, 8, 16, 1)
    cw_tl: np.ndarray  # (d,)
    cw_tr: np.ndarray  # (d,)
    rk_masks: np.ndarray  # (11, 8, 16, 3, 1)
    fcw_mask: np.ndarray  # scalar uint32
    d_levels: int
    rows_per_shard: int  # covered rows per shard (padded)


def make_sharded_key(
    server: dpf_host.Dpf, key: dpf_host.Key2P, height: int, n_shards: int
) -> ShardedKeyArrays:
    """Split one DPF share into per-row-shard subtree seed sets."""
    nb = server.num_bits
    min_nodes = 32 * n_shards
    lvl, m = 0, 1
    while lvl < nb and m < min_nodes:
        lvl += 1
        m = -(-height // (1 << (nb - lvl)))
    if m < min_nodes:
        raise ValueError(
            f"height {height} too small to shard {n_shards} ways (need >= "
            f"{min_nodes} leaf nodes)"
        )
    per_shard_nodes = -(-m // n_shards)
    per_shard_nodes = -(-per_shard_nodes // 32) * 32
    m_padded = per_shard_nodes * n_shards

    plan = ExpandPlan(nb, height, lvl, m, m_padded, nb - lvl)
    seeds, t_bits = _host_prefix(server, key, plan)
    pad = m_padded - seeds.shape[0]
    if pad:
        seeds = np.concatenate([seeds, np.zeros((pad, 16), dtype=np.uint8)])
        t_bits = np.concatenate([t_bits, np.zeros(pad, dtype=np.uint8)])

    seed_planes = np.stack(
        [
            blocks_to_planes(seeds[k * per_shard_nodes:(k + 1) * per_shard_nodes])
            for k in range(n_shards)
        ]
    )  # (D, 8, 16, NWs)
    t_packed = np.stack(
        [
            _pack_t(
                t_bits[k * per_shard_nodes:(k + 1) * per_shard_nodes],
                per_shard_nodes,
            )
            for k in range(n_shards)
        ]
    )
    cw_seed_masks, tl, tr = _cw_masks(key, lvl)
    return ShardedKeyArrays(
        seeds=seed_planes,
        t=t_packed,
        cw_seed_masks=cw_seed_masks,
        cw_tl=tl,
        cw_tr=tr,
        rk_masks=np.asarray(prf_key_masks(server)),
        fcw_mask=np.uint32(0xFFFFFFFF if (key.final_cw & 1) else 0),
        d_levels=nb - lvl,
        rows_per_shard=per_shard_nodes << (nb - lvl),
    )


def shard_local_perm(d_levels: int, per_shard_nodes: int) -> np.ndarray:
    """Natural local row -> local storage position (same for every shard)."""
    rows = per_shard_nodes << d_levels
    x = np.arange(rows, dtype=np.int64)
    s = x >> d_levels
    local = x & ((1 << d_levels) - 1)
    rev = np.zeros_like(local)
    for b in range(d_levels):
        rev |= ((local >> b) & 1) << (d_levels - 1 - b)
    return rev * per_shard_nodes + s


def pad_table_rows(table: np.ndarray, total_rows: int) -> np.ndarray:
    """Zero-pad a (H, C) table to the sharded row count."""
    if table.shape[0] == total_rows:
        return table
    out = np.zeros((total_rows, table.shape[1]), dtype=table.dtype)
    out[: table.shape[0]] = table
    return out


@dataclass
class ShardedFastKeyArrays:
    """Fast-mode per-query arrays split into row shards (leaf tree split)."""

    seeds: np.ndarray  # (D, 8, 16, NWs)
    t: np.ndarray  # (D, NWs)
    cw_seed_masks: np.ndarray  # (d, 8, 16, 1)
    cw_tl: np.ndarray
    cw_tr: np.ndarray
    fcw_masks: np.ndarray  # (8, 16, 1)
    rk_masks: np.ndarray  # (11, 8, 3, 16, 1)
    rk_leaf: np.ndarray  # (11, 8, 16, 1)
    d_levels: int
    per_shard_nodes: int
    rows_per_shard: int  # = per_shard_nodes * 2^d_levels * 128


def make_sharded_fast_key(
    server: dpf_host.Dpf, fkey, n_shards: int
) -> ShardedFastKeyArrays:
    """Split a fast-mode DPF share into per-row-shard subtree seed sets."""
    from ..dpf.aes_host import key_schedule
    from ..dpf.bitslice import key_masks
    from ..dpf.device import ExpandPlan, _block_masks, _cw_masks_list

    depth = fkey.depth
    n_leaves = -(-fkey.height // dpf_host.LEAF_BITS)
    min_nodes = 32 * n_shards
    lvl, m = 0, 1
    while lvl < depth and m < min_nodes:
        lvl += 1
        m = -(-n_leaves // (1 << (depth - lvl)))
    if m < min_nodes:
        raise ValueError(
            f"height {fkey.height} too small to shard {n_shards} ways in fast "
            f"mode (need >= {min_nodes * dpf_host.LEAF_BITS} rows)"
        )
    per_shard = -(-(-(-m // n_shards)) // 32) * 32
    m_padded = per_shard * n_shards

    plan = ExpandPlan(depth, n_leaves, lvl, m, m_padded, depth - lvl)
    tree_key = dpf_host.Key2P(fkey.s_init, fkey.t_init, fkey.cw, 0)
    saved = server.num_bits
    server.num_bits = depth
    seeds, t_bits = _host_prefix(server, tree_key, plan)
    server.num_bits = saved
    pad = m_padded - seeds.shape[0]
    if pad:
        seeds = np.concatenate([seeds, np.zeros((pad, 16), dtype=np.uint8)])
        t_bits = np.concatenate([t_bits, np.zeros(pad, dtype=np.uint8)])

    seed_planes = np.stack(
        [blocks_to_planes(seeds[k * per_shard:(k + 1) * per_shard])
         for k in range(n_shards)]
    )
    t_packed = np.stack(
        [_pack_t(t_bits[k * per_shard:(k + 1) * per_shard], per_shard)
         for k in range(n_shards)]
    )
    cw_seed_masks, tl, tr = _cw_masks_list(fkey.cw[lvl:])
    rk_leaf = key_masks(key_schedule(server.ciphers[3].key)[None])
    return ShardedFastKeyArrays(
        seeds=seed_planes,
        t=t_packed,
        cw_seed_masks=cw_seed_masks,
        cw_tl=tl,
        cw_tr=tr,
        fcw_masks=np.asarray(_block_masks(fkey.final_cw_block)),
        rk_masks=np.asarray(prf_key_masks(server)),
        rk_leaf=np.asarray(rk_leaf),
        d_levels=depth - lvl,
        per_shard_nodes=per_shard,
        rows_per_shard=(per_shard << (depth - lvl)) * dpf_host.LEAF_BITS,
    )


def make_sharded_fast_answer_step(mesh: Mesh, d_levels: int):
    """Fast-mode multi-chip batched answer step (tp=rows, dp=queries).

    step(table (H_pad, C) P('tp',None),
         seeds (D, Q, 8,16,NWs) P('tp','dp'), t (D, Q, NWs) P('tp','dp'),
         cw_s/cw_tl/cw_tr/fcw/rk/rk_leaf (Q, ...) P('dp'),
         perm (rows_per_shard,) replicated) -> (Q, C) uint32.
    """
    from ..dpf.device import fast_leaf_bits
    from ..models.pipeline import _expand_planes_loop

    def local(table_s, seeds_s, t_s, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf, perm):
        seeds_s = seeds_s[0]
        t_s = t_s[0]

        def one(s, t, cs, ctl, ctr, f, r, rl):
            s, t = _expand_planes_loop(s, t, cs, ctl, ctr, r, d_levels)
            bits = fast_leaf_bits(s, t, f, rl, perm)
            mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, None]
            return xor_reduce(table_s & mask, axis=0)

        partial = jax.vmap(one)(seeds_s, t_s, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf)
        gathered = jax.lax.all_gather(partial, "tp")
        return xor_reduce(gathered, axis=0)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("tp", None),
            P("tp", "dp"),
            P("tp", "dp"),
            P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
            P(),
        ),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(mapped)


class MeshPirServer:
    """Multi-chip serving engine: same query surface as TpuPirServer but
    every batch is answered by the whole device mesh (tp = DB rows,
    dp = query batch), the deployment-scale analogue of the reference's
    nprocs partial merge (db.go:256-261).

    The table is uploaded once per group size (padded to the sharded row
    count); per query the host computes only the subtree-prefix seeds for
    each row shard (make_sharded_key) and the mesh expands + scans +
    XOR-combines over ICI. Keyword / multi-party / tiny-domain queries
    fall back to the host path with identical semantics.
    """

    def __init__(self, db, mesh: Mesh | None = None, tp: int | None = None,
                 dp: int = 1):
        if mesh is None:
            n = (tp or len(jax.devices()) // dp) * dp
            mesh = make_mesh(n, dp=dp)
        self.db = db
        self.mesh = mesh
        self.n_shards = mesh.shape["tp"]
        self.dp = mesh.shape["dp"]
        self._tables: dict[tuple, object] = {}
        self._perms: dict[tuple, object] = {}
        self._steps: dict[tuple, object] = {}
        # serializes table builds against live updates (apply_updates):
        # a build that read pre-update rows must not land after a patch
        self._lock = threading.RLock()

    # ---- live updates ----

    def apply_updates(self, updates: dict[int, bytes]) -> None:
        """Apply live slot updates to the mesh-resident tables: one
        row-scatter per cached layout (the tables are natural-row-order
        packed u32 words, so positions are the grid rows themselves).
        See TpuPirServer.apply_updates for the serving rationale. Runs
        under the table lock so a concurrent first-use build can never
        insert a pre-update table after the patch loop ran."""
        from ..ops.scan import pack_rows_u32

        with self._lock:
            self.db.update_slots(updates, copy_on_write=True)
            idxs = np.unique(np.fromiter((int(i) for i in updates),
                                         dtype=np.int64, count=len(updates)))
            sb = self.db.slot_bytes
            for (g, rows_per_shard), tbl in list(self._tables.items()):
                h = self.db.db_size // g
                r = np.unique(idxs // g)
                r = r[r < h]
                if not len(r):
                    continue
                vals = pack_rows_u32(self.db.data, r, g, sb)
                self._tables[(g, rows_per_shard)] = (
                    jnp.asarray(tbl).at[jnp.asarray(r)].set(jnp.asarray(vals))
                )

    # ---- geometry + caches ----

    def _sharded_table(self, group_size: int, rows_per_shard: int):
        from ..ops.scan import pack_table_u32

        key = (group_size, rows_per_shard)
        if key not in self._tables:
            with self._lock:
                if key not in self._tables:
                    h = self.db.db_size // group_size
                    table = pack_table_u32(self.db.data, h, group_size)
                    table = pad_table_rows(table,
                                           self.n_shards * rows_per_shard)
                    self._tables[key] = jax.device_put(jnp.asarray(table))
        return self._tables[key]

    def _step(self, kind: str, d_levels: int):
        key = (kind, d_levels)
        if key not in self._steps:
            self._steps[key] = (
                make_sharded_fast_answer_step(self.mesh, d_levels)
                if kind == "fast"
                else make_sharded_answer_step(self.mesh, d_levels)
            )
        return self._steps[key]

    def _perm(self, kind: str, d_levels: int, per_shard_nodes: int,
              rows_per_shard: int):
        from ..dpf.device import _fast_leaf_perm

        key = (kind, d_levels, per_shard_nodes)
        if key not in self._perms:
            self._perms[key] = jnp.asarray(
                _fast_leaf_perm(d_levels, rows_per_shard, per_shard_nodes)
                if kind == "fast"
                else shard_local_perm(d_levels, per_shard_nodes)
            )
        return self._perms[key]

    def _mesh_applicable(self, query) -> bool:
        if not query.is_two_party or query.is_keyword_based:
            return False
        h = self.db.db_size // query.group_size
        if query.key_fast is not None:
            return h >= 128 * 32 * self.n_shards
        return h >= 32 * self.n_shards * 2  # subtree split needs headroom

    # ---- host-path compatibility surface (audit reuse, fallbacks) ----

    def expand_shared_query(self, query):
        from .. import server as srv

        return srv.expand_shared_query(self.db, query)

    def private_secret_shared_query_with_expanded_bits(self, query, bits):
        from .. import server as srv

        return srv.private_secret_shared_query_with_expanded_bits(
            self.db, query, np.asarray(bits).astype(bool)
        )

    # ---- mesh answer paths ----

    def _answer_batch_compat(self, queries):
        from ..ops.scan import unpack_result_u32
        from ..slot import Slot
        from ..utils.bits import num_bits_for_height

        g = queries[0].group_size
        h = self.db.db_size // g
        nb = num_bits_for_height(h)
        keys = []
        for s in queries:
            pf = dpf_host.server_initialize(s.prf_keys, nb)
            keys.append(make_sharded_key(pf, s.key_two_party, h, self.n_shards))
        k0 = keys[0]
        seeds = np.stack([k.seeds for k in keys], axis=1)
        t = np.stack([k.t for k in keys], axis=1)
        cw_s = np.stack([k.cw_seed_masks for k in keys])
        cw_tl = np.stack([k.cw_tl for k in keys])
        cw_tr = np.stack([k.cw_tr for k in keys])
        rk = np.stack([k.rk_masks for k in keys])
        fcw = np.array([k.fcw_mask for k in keys], dtype=np.uint32)
        per_shard_nodes = k0.seeds.shape[-1] * 32
        perm = self._perm("compat", k0.d_levels, per_shard_nodes,
                          k0.rows_per_shard)
        table = self._sharded_table(g, k0.rows_per_shard)
        step = self._step("compat", k0.d_levels)
        out = np.asarray(step(table, seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, perm))
        sb = self.db.slot_bytes
        results = []
        for i in range(len(queries)):
            res = unpack_result_u32(out[i], g, sb)
            results.append(_shared_result(sb, [Slot(res[c].tobytes())
                                               for c in range(g)]))
        return results

    def _answer_batch_fast(self, queries):
        from ..ops.scan import unpack_result_u32
        from ..slot import Slot

        g = queries[0].group_size
        keys = []
        for s in queries:
            pf = dpf_host.server_initialize(s.prf_keys, s.key_fast.depth)
            keys.append(make_sharded_fast_key(pf, s.key_fast, self.n_shards))
        k0 = keys[0]
        seeds = np.stack([k.seeds for k in keys], axis=1)
        t = np.stack([k.t for k in keys], axis=1)
        cw_s = np.stack([k.cw_seed_masks for k in keys])
        cw_tl = np.stack([k.cw_tl for k in keys])
        cw_tr = np.stack([k.cw_tr for k in keys])
        fcw = np.stack([k.fcw_masks for k in keys])
        rk = np.stack([k.rk_masks for k in keys])
        rk_leaf = np.stack([k.rk_leaf for k in keys])
        perm = self._perm("fast", k0.d_levels, k0.per_shard_nodes,
                          k0.rows_per_shard)
        table = self._sharded_table(g, k0.rows_per_shard)
        step = self._step("fast", k0.d_levels)
        out = np.asarray(
            step(table, seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf, perm)
        )
        sb = self.db.slot_bytes
        results = []
        for i in range(len(queries)):
            res = unpack_result_u32(out[i], g, sb)
            results.append(_shared_result(sb, [Slot(res[c].tobytes())
                                               for c in range(g)]))
        return results

    def private_secret_shared_query_batch(self, queries):
        from .. import server as srv

        if not queries:
            return []
        q0 = queries[0]
        uniform = all(
            q.group_size == q0.group_size
            and q.is_two_party == q0.is_two_party
            and q.is_keyword_based == q0.is_keyword_based
            and (q.key_fast is not None) == (q0.key_fast is not None)
            for q in queries
        )
        if not uniform or not self._mesh_applicable(q0):
            return [srv.private_secret_shared_query(self.db, q)
                    for q in queries]
        # dp requires Q % dp == 0: pad by repeating (padding sliced off).
        # The batch may be smaller than the pad needed (n=1, dp=3), so
        # tile the whole batch as many times as it takes.
        n = len(queries)
        if n % self.dp:
            from ..utils import pad_tile

            queries = pad_tile(queries, n + self.dp - n % self.dp)
        if q0.key_fast is not None:
            return self._answer_batch_fast(queries)[:n]
        return self._answer_batch_compat(queries)[:n]

    def private_secret_shared_query(self, query):
        return self.private_secret_shared_query_batch([query])[0]


def _shared_result(slot_bytes, slots):
    from ..query import SecretSharedQueryResult

    return SecretSharedQueryResult(slot_bytes, slots)


def make_sharded_answer_step(mesh: Mesh, d_levels: int):
    """Build the jitted multi-chip batched answer step.

    Returns step(table, seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, perm) where
      table (H_pad, C) uint32             sharded P('tp', None)
      seeds (D, Q, 8, 16, NWs)            P('tp', 'dp')
      t     (D, Q, NWs)                   P('tp', 'dp')
      cw_s  (Q, d, 8, 16, 1), cw_tl/r (Q, d)   P('dp')
      rk    (Q, 11, 8, 16, 3, 1)          P('dp')
      fcw   (Q,)                          P('dp')
      perm  (rows_per_shard,)             replicated
    and yields (Q, C) uint32 XOR-combined answer shares.
    """

    def local(table_s, seeds_s, t_s, cw_s, cw_tl, cw_tr, rk, fcw, perm):
        # leading tp axis of size 1 on seeds/t
        seeds_s = seeds_s[0]
        t_s = t_s[0]

        def one(s, t, cs, ctl, ctr, r, f):
            bits = expand_bits_planes(
                s, t, cs, ctl, ctr, r, f, perm, d_levels=d_levels
            )
            mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, None]
            return xor_reduce(table_s & mask, axis=0)

        partial = jax.vmap(one)(seeds_s, t_s, cw_s, cw_tl, cw_tr, rk, fcw)
        # XOR-combine across row shards: XLA lacks an XOR AllReduce, so
        # all_gather the (tiny) per-shard answers over ICI and fold locally
        # (this is the multi-chip form of db.go:256-261's partial merge).
        gathered = jax.lax.all_gather(partial, "tp")  # (D, Qs, C)
        return xor_reduce(gathered, axis=0)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("tp", None),
            P("tp", "dp"),
            P("tp", "dp"),
            P("dp"),
            P("dp"),
            P("dp"),
            P("dp"),
            P("dp"),
            P(),
        ),
        out_specs=P("dp"),
        # the all_gather+fold leaves the value replicated across 'tp', but
        # the static replication checker can't infer that through lax.reduce
        check_vma=False,
    )

    return jax.jit(mapped)
