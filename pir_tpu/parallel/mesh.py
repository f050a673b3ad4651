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


def pow2_padded_len(n: int, dp: int, chunk: int = 1) -> int:
    """Batch length padded so each dp shard's slice is a power of two
    (capped at `chunk`), or a power-of-two multiple of `chunk` above it.

    Keeps the set of compiled step shapes LOGARITHMIC in batch size —
    every distinct Q axis compiles a fresh executable, which costs
    minutes on a remote-compile rig (the mesh analogue of
    TpuPirServer's compat_pallas power-of-two slice policy)."""
    per = -(-n // dp)
    if per <= chunk:
        p = min(1 << (per - 1).bit_length(), chunk)
    else:
        p = chunk << (-(-per // chunk) - 1).bit_length()
    return p * dp


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
    leaf_bits = fkey.leaf_bits
    n_blk = leaf_bits // 128
    n_leaves = -(-fkey.height // leaf_bits)
    min_nodes = 32 * n_shards
    lvl, m = 0, 1
    while lvl < depth and m < min_nodes:
        lvl += 1
        m = -(-n_leaves // (1 << (depth - lvl)))
    # m may stay below 32 * n_shards on small tables (wide leaves shrink
    # the node count: leaf_bits=1024 needs 32768 rows per shard for a
    # full 32-node lane word). The 32-node floor is only a lane-word
    # packing convenience, so pad with zero seeds instead of refusing:
    # padded nodes expand to garbage bits that select zero-padded table
    # rows (pad_table_rows), XOR-neutral by construction — the same
    # mechanism already used for non-divisible real node counts.
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
    from ..dpf.device import _block_masks_wide

    return ShardedFastKeyArrays(
        seeds=seed_planes,
        t=t_packed,
        cw_seed_masks=cw_seed_masks,
        cw_tl=tl,
        cw_tr=tr,
        fcw_masks=np.asarray(
            _block_masks(fkey.final_cw_block) if n_blk == 1
            else _block_masks_wide(fkey.final_cw_block)
        ),
        rk_masks=np.asarray(prf_key_masks(server)),
        rk_leaf=np.asarray(rk_leaf),
        d_levels=depth - lvl,
        per_shard_nodes=per_shard,
        rows_per_shard=(per_shard << (depth - lvl)) * leaf_bits,
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


def make_sharded_fast_root_step(mesh: Mesh, layout, shard_levels: int,
                                tail_levels: int = 5,
                                block_rows: int = 2048,
                                block_cols: int = 512,
                                interpret: bool = False):
    """Root-start multi-chip fast step — the single-chip serving pipeline
    per shard, with NO per-query host work.

    The client payload is IDENTICAL to the single-chip batched path
    (make_fast_payload_batch, batch-shared keys): each tp shard unpacks
    it on device, walks its static `shard_levels`-level subtree prefix
    (child chosen per level by the bits of jax.lax.axis_index('tp'), at
    full Q lanes), then runs the exact serving kernels — Q-in-lanes XLA
    head, Pallas AES tail + leaf PRG, packed-bits MXU scan — over its
    shard-local storage-ordered u8 table slice, and the per-shard answer
    shares XOR-combine over ICI (db.go:256-261's partial merge at
    deployment scale). Requires tp = 2^shard_levels.

    step(table (tp * flat_local_pad, B) u8  P('tp', None),
         payloads (Q, L) uint32             P('dp', None))
      -> (Q, B) uint8                       P('dp', None)
    """
    from ..dpf.device import (
        _children,
        _expand_root_level_lanes,
        _prf_triple,
        unpack_fast_root_payload,
        unpack_fast_root_payload_lanes,
    )
    from ..models.pipeline import scan_tile_sizes
    from ..ops.pallas_expand import fast_tail_expand_pallas
    from ..ops.pallas_scan import mxu_batched_scan_packed_pallas

    if not getattr(layout, "shared_rk", False):
        raise ValueError("root-start mesh step needs the batch-shared "
                         "key layout (batch keygen)")
    depth = layout.depth
    if shard_levels > depth:
        raise ValueError(f"cannot shard {1 << shard_levels} ways: the "
                         f"fast tree has only {depth} levels")
    d_local = depth - shard_levels
    tail = max(0, min(tail_levels, d_local - 5))
    head_local = d_local - tail

    def local(table_s, payloads):
        q_n = payloads.shape[0]
        _, _, _, _, _, _, rk, rk_leaf = unpack_fast_root_payload(
            payloads[0], layout
        )
        seeds, t, cw_s, cw_tl, cw_tr, fcw = unpack_fast_root_payload_lanes(
            payloads, layout
        )
        s_idx = jax.lax.axis_index("tp")
        one = jnp.uint32(1)
        # static subtree-prefix walk: one PRF triple per level at full Q
        # lanes, child selected by the shard index bit (MSB-first, the
        # tree's bit order); occupancy stays 1 bit/word so everything is
        # masked back to bit 0 (the cw correction smears mask-word t
        # bits into the upper lanes otherwise).
        for l in range(shard_levels):
            out = _prf_triple(seeds, rk)
            s_l, t_l, s_r, t_r = _children(
                out, t, cw_s[l], cw_tl[l], cw_tr[l]
            )
            bit = (s_idx >> (shard_levels - 1 - l)) & 1
            m = jnp.uint32(0) - bit.astype(jnp.uint32)
            seeds = (s_l ^ ((s_l ^ s_r) & m)) & one
            t = (t_l ^ ((t_l ^ t_r) & m)) & one
        # local Q-in-lanes head over the shard's subtree
        for j in range(head_local):
            w = max(1, (1 << j) // 32)
            g_l = shard_levels + j
            seeds, t = _expand_root_level_lanes(
                seeds, t, cw_s[g_l], cw_tl[g_l], cw_tr[g_l], rk, j, w
            )
        nw0 = max(1, (1 << head_local) // 32)
        seeds = seeds.reshape(8, 16, nw0, q_n).transpose(3, 0, 1, 2)
        t = t.reshape(nw0, q_n).T[:, None, :]
        lo = shard_levels + head_local
        cw_s_t = jnp.transpose(cw_s[lo:], (3, 0, 1, 2))[..., None]
        packed = fast_tail_expand_pallas(
            seeds, t, cw_s_t, cw_tl[lo:].T, cw_tr[lo:].T, rk,
            fcw[..., None], rk_leaf, levels=tail, interpret=interpret,
        )
        words = packed.reshape(q_n, -1)
        rows, b = table_s.shape
        flat = words.shape[1] * 32
        if rows > flat:
            words = jnp.pad(words, ((0, 0), (0, (rows - flat) // 32)))
        br, bc = scan_tile_sizes(q_n, rows, b,
                                 max_br=block_rows, max_bc=block_cols)
        partial = mxu_batched_scan_packed_pallas(
            table_s, words.T, block_rows=br, block_cols=bc,
            interpret=interpret,
        )
        gathered = jax.lax.all_gather(partial, "tp")
        return xor_reduce(gathered, axis=0)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tp", None), P("dp", None)),
        out_specs=P("dp", None),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_fast_root_stacked_step(mesh: Mesh, layout,
                                        shard_levels: int,
                                        block_rows: int = 2048,
                                        block_cols: int = 512,
                                        interpret: bool = False):
    """Root-start multi-chip fast step via the STACKED tail kernel —
    the r4 single-chip serving pipeline per shard (k lane-packed queries
    per grid step, full-tile AES at every level; measured 2.5x the
    per-query tail's roof fraction, docs/PERFORMANCE.md r4 table).

    Identical surface to make_sharded_fast_root_step; each tp shard walks
    its static shard prefix at full Q lanes, runs the stacked head/tail
    over its LOCAL d_local-level subtree (stacked_fast_geometry sized
    from d_local, so per-shard VMEM budgets match the single-chip
    kernel's), and scans its shard slice of the CHUNK-MAJOR stacked
    storage table (build_sharded_root_table_u8 with stacked=True).
    Partial answers XOR-combine over ICI (db.go:256-261's merge).

    step(table (tp * flat_local_pad, B) u8  P('tp', None),
         payloads (Q, L) uint32             P('dp', None))
      -> (Q, B) uint8                       P('dp', None)
    """
    from ..dpf.device import (
        _children,
        _expand_root_level_lanes,
        _leaf_ctr_masks,
        _prf_triple,
        regroup_head_stacked,
        unpack_fast_root_payload,
        unpack_fast_root_payload_lanes,
    )
    from ..models.pipeline import (
        _SCAN_Q_VMEM,
        scan_tile_sizes,
        stacked_fast_geometry,
    )
    from ..ops.pallas_expand import fast_tail_expand_stacked_pallas
    from ..ops.pallas_scan import mxu_batched_scan_packed_pallas

    if not getattr(layout, "shared_rk", False):
        raise ValueError("root-start mesh step needs the batch-shared "
                         "key layout (batch keygen)")
    depth = layout.depth
    n_blk = layout.leaf_blocks
    if shard_levels > depth:
        raise ValueError(f"cannot shard {1 << shard_levels} ways: the "
                         f"fast tree has only {depth} levels")
    d_local = depth - shard_levels
    k, tail = stacked_fast_geometry(d_local, n_blk)
    head_local = d_local - tail
    nw0 = max(1, (1 << head_local) // 32)

    def local(table_s, payloads):
        q_n = payloads.shape[0]
        qp = -(-q_n // k) * k
        if qp != q_n:  # pad to the step group; sliced back before gather
            payloads = jnp.concatenate(
                [payloads, jnp.tile(payloads[:1], (qp - q_n, 1))])
        _, _, _, _, _, _, rk, rk_leaf = unpack_fast_root_payload(
            payloads[0], layout
        )
        seeds, t, cw_s, cw_tl, cw_tr, fcw = unpack_fast_root_payload_lanes(
            payloads, layout
        )
        s_idx = jax.lax.axis_index("tp")
        one = jnp.uint32(1)
        # static subtree-prefix walk (see make_sharded_fast_root_step)
        for l in range(shard_levels):
            out = _prf_triple(seeds, rk)
            s_l, t_l, s_r, t_r = _children(
                out, t, cw_s[l], cw_tl[l], cw_tr[l]
            )
            bit = (s_idx >> (shard_levels - 1 - l)) & 1
            m = jnp.uint32(0) - bit.astype(jnp.uint32)
            seeds = (s_l ^ ((s_l ^ s_r) & m)) & one
            t = (t_l ^ ((t_l ^ t_r) & m)) & one
        # local Q-in-lanes head, then regroup for the stacked tail
        for j in range(head_local):
            w = max(1, (1 << j) // 32)
            g_l = shard_levels + j
            seeds, t = _expand_root_level_lanes(
                seeds, t, cw_s[g_l], cw_tl[g_l], cw_tr[g_l], rk, j, w
            )
        lo = shard_levels + head_local
        seeds, t, cw_t, cw_tl_t, cw_tr_t, fg = regroup_head_stacked(
            seeds, t, cw_s[lo:], cw_tl[lo:], cw_tr[lo:], fcw, k, nw0, n_blk
        )
        packed = fast_tail_expand_stacked_pallas(
            seeds, t, cw_t, cw_tl_t, cw_tr_t, rk, fg, rk_leaf,
            jnp.asarray(_leaf_ctr_masks(n_blk)),
            tail=tail, n_blk=n_blk, interpret=interpret,
        )  # (S, 8, BN, 16, W); lanes query-major (j*NW0 + w)
        s_n, _, bn, _, _ = packed.shape
        words = packed.reshape(s_n, 8, bn, 16, k, nw0)
        words = words.transpose(0, 4, 1, 2, 3, 5).reshape(qp, -1)
        rows, b = table_s.shape
        flat = words.shape[1] * 32
        if rows > flat:
            words = jnp.pad(words, ((0, 0), (0, (rows - flat) // 32)))
        outs = []
        for s in range(0, qp, _SCAN_Q_VMEM):
            wc = words[s:s + _SCAN_Q_VMEM]
            br, bc = scan_tile_sizes(wc.shape[0], rows, b,
                                     max_br=block_rows, max_bc=block_cols)
            outs.append(mxu_batched_scan_packed_pallas(
                table_s, wc.T, block_rows=br, block_cols=bc,
                interpret=interpret,
            ))
        partial = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        partial = partial[:q_n]
        gathered = jax.lax.all_gather(partial, "tp")
        return xor_reduce(gathered, axis=0)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tp", None), P("dp", None)),
        out_specs=P("dp", None),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_compat_root_step(mesh: Mesh, layout, shard_levels: int,
                                  w: int = 128, max_tail: int = 3,
                                  q_chunk: int = 16,
                                  block_rows: int = 2048,
                                  block_cols: int = 512,
                                  interpret: bool = False):
    """Root-start multi-chip COMPAT step — the reference-exact cascaded
    Pallas pipeline per shard, no per-query host work.

    Same shape as make_sharded_fast_root_step: identical client payloads
    to the single-chip compat path (make_compat_payload_batch); each tp
    shard runs the device-side dead-level skip walk, then its static
    `shard_levels`-level subtree walk (child by the bits of
    axis_index('tp')), then the single-chip cascade — XLA root-start
    head to `w` lane words, Pallas stages of <= `max_tail` levels with
    the varint-parity leaf rule — and the packed-bits MXU scan over its
    shard-local storage-ordered u8 table; partials XOR-combine over ICI.
    Requires tp = 2^shard_levels and device_bits - shard_levels >
    5 + log2(w); callers pad Q per dp shard to a q_chunk multiple.
    """
    from ..dpf.device import (
        _children,
        _prf_triple,
        compat_stage_plan,
        expand_planes_from_root,
        unpack_compat_root_payload,
    )
    from ..models.pipeline import _compat_skip_walk, scan_tile_sizes
    from ..ops.pallas_expand import compat_stage_pallas
    from ..ops.pallas_scan import mxu_batched_scan_packed_pallas

    nbd, sk = layout.device_bits, layout.skip
    if shard_levels and (1 << shard_levels) != mesh.shape["tp"]:
        raise ValueError("tp must equal 2^shard_levels")
    d_local = nbd - shard_levels
    split, tails = compat_stage_plan(d_local, w, max_tail)

    def local(table_s, payloads):
        s_idx = jax.lax.axis_index("tp")

        def head(payload):
            seeds, t, cw_s, cw_tl, cw_tr, fcw, rk = (
                unpack_compat_root_payload(payload, layout)
            )
            seeds, t = _compat_skip_walk(seeds, t, cw_s, cw_tl, cw_tr, rk, sk)
            for l in range(shard_levels):
                out = _prf_triple(seeds, rk)
                s_l, t_l, s_r, t_r = _children(
                    out, t, cw_s[sk + l], cw_tl[sk + l], cw_tr[sk + l]
                )
                bit = (s_idx >> (shard_levels - 1 - l)) & 1
                m = jnp.uint32(0) - bit.astype(jnp.uint32)
                seeds = s_l ^ ((s_l ^ s_r) & m)
                t = t_l ^ ((t_l ^ t_r) & m)
            lo = sk + shard_levels
            seeds, t = expand_planes_from_root(
                seeds, t, cw_s[lo:lo + split], cw_tl[lo:lo + split],
                cw_tr[lo:lo + split], rk, split
            )
            return (seeds[:, None], t.reshape(1, 1, w), cw_s[lo + split:],
                    cw_tl[lo + split:], cw_tr[lo + split:], rk, fcw)

        def bits_chunk(payloads_c):
            seeds, t, cw_s, cw_tl, cw_tr, rk, fcw = jax.vmap(head)(payloads_c)
            off = 0
            for si, tl in enumerate(tails):
                res = compat_stage_pallas(
                    seeds, t, cw_s[:, off:off + tl], cw_tl[:, off:off + tl],
                    cw_tr[:, off:off + tl], rk, fcw,
                    tail=tl, emit_bits=(si == len(tails) - 1),
                    interpret=interpret,
                )
                if si == len(tails) - 1:
                    packed = res
                else:
                    seeds, t = res
                off += tl
            return packed.reshape(packed.shape[0], -1)

        qn = payloads.shape[0]
        if qn <= q_chunk:
            words = bits_chunk(payloads)
        else:
            words = jax.lax.map(
                bits_chunk, payloads.reshape(-1, q_chunk, payloads.shape[1])
            ).reshape(qn, -1)
        rows, b = table_s.shape
        pad = rows - words.shape[1] * 32
        if pad:
            words = jnp.pad(words, ((0, 0), (0, pad // 32)))
        br, bc = scan_tile_sizes(qn, rows, b,
                                 max_br=block_rows, max_bc=block_cols)
        partial = mxu_batched_scan_packed_pallas(
            table_s, words.T, block_rows=br, block_cols=bc,
            interpret=interpret,
        )
        gathered = jax.lax.all_gather(partial, "tp")
        return xor_reduce(gathered, axis=0)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tp", None), P("dp", None)),
        out_specs=P("dp", None),
        check_vma=False,
    )
    return jax.jit(mapped)


def build_sharded_compat_table_u8(data: np.ndarray, height: int,
                                  group_size: int, slot_bytes: int,
                                  nbd: int, shard_levels: int, w: int,
                                  tails: tuple, pad_to: int = 8192
                                  ) -> np.ndarray:
    """Shard-local storage-ordered u8 table for the compat root-start
    mesh step (the per-shard analogue of the single-chip
    _compat_root_table_u8: rows scattered by the cascade's stacked-chunk
    order over the LOCAL d_local-level subtree)."""
    from ..dpf.device import _compat_perm_pallas, scatter_rows_to_storage_order
    from ..ops.matmul_scan import pad_rows_u8

    d_local = nbd - shard_levels
    n_shards = 1 << shard_levels
    rows_per_shard = 1 << d_local
    flat_local = 1 << d_local
    h = height // group_size
    row_bytes = group_size * slot_bytes
    rows = data[: h * group_size].reshape(h, row_bytes)
    slices = []
    for s in range(n_shards):
        lo = s * rows_per_shard
        local_h = min(max(h - lo, 0), rows_per_shard)
        if local_h:
            perm = _compat_perm_pallas(d_local, local_h, w, tuple(tails))
            sc = scatter_rows_to_storage_order(
                rows[lo:lo + local_h], perm, flat_local
            )
        else:
            sc = np.zeros((flat_local, row_bytes), dtype=np.uint8)
        slices.append(pad_rows_u8(sc, pad_to))
    return np.concatenate(slices, axis=0)


def build_sharded_root_table_u8(data: np.ndarray, height: int,
                                group_size: int, slot_bytes: int,
                                depth: int, shard_levels: int,
                                pad_to: int = 8192,
                                n_blk: int = 1,
                                stacked_tail: int | None = None
                                ) -> np.ndarray:
    """Shard-local storage-ordered u8 table for the root-start mesh step.

    Shard s owns natural rows [s * rows_per_shard, (s+1) * rows_per_shard)
    scattered by the LOCAL storage perm — the bit-reversal order the
    per-query tail emits, or (stacked_tail is not None) the chunk-major
    order of the stacked tail kernel at that tail depth; each shard slice
    is zero-padded to a common multiple-of-`pad_to` length and the slices
    are stacked so P('tp') sharding hands slice s to tp shard s.
    """
    from ..dpf.device import (
        _fast_leaf_perm_root,
        _fast_leaf_perm_root_stacked,
        scatter_rows_to_storage_order,
    )
    from ..ops.matmul_scan import pad_rows_u8

    d_local = depth - shard_levels
    n_shards = 1 << shard_levels
    rows_per_shard = (128 * n_blk) << d_local
    flat_local = (128 * n_blk) << d_local
    h = height // group_size
    row_bytes = group_size * slot_bytes
    rows = data[: h * group_size].reshape(h, row_bytes)
    slices = []
    for s in range(n_shards):
        lo = s * rows_per_shard
        local_h = min(max(h - lo, 0), rows_per_shard)
        if local_h:
            perm = (
                _fast_leaf_perm_root_stacked(d_local, local_h, n_blk,
                                             stacked_tail)
                if stacked_tail is not None
                else _fast_leaf_perm_root(d_local, local_h, n_blk)
            )
            sc = scatter_rows_to_storage_order(
                rows[lo:lo + local_h], perm, flat_local
            )
        else:
            sc = np.zeros((flat_local, row_bytes), dtype=np.uint8)
        slices.append(pad_rows_u8(sc, pad_to))
    return np.concatenate(slices, axis=0)


def make_sharded_point_step(mesh: Mesh, num_bits: int):
    """2-party KEYWORD (arbitrary-point) multi-chip batched answer step.

    Each tp shard owns a contiguous row range, the branch-bit planes of
    ITS rows' keywords (db.go:132-135: the DPF evaluates on
    db.Keywords[row]), and the matching table slice; the point-eval walk
    (dpf/server.go:55-101 semantics, shared traced core with the
    single-chip path) is pointwise per row, so sharding the lane-word
    axis shards the AES work exactly.

    step(table (tp * rows_local, C) u32   P('tp', None),
         xbits (num_bits, tp * NW_local)  P(None, 'tp'),
         s_masks (Q,8,16,1), t_mask (Q,), cw_s (Q,nb,8,16,1),
         cw_tl / cw_tr (Q,nb), rk (Q,11,8,16,3,1), fcw (Q,)  P('dp'))
      -> (Q, C) uint32 P('dp').
    """
    from ..dpf.device import _unpack_bits, point_eval_packed_core

    def local(table_s, xbits_s, s_m, t_m, cw_s, cw_tl, cw_tr, rk, fcw):
        rows = table_s.shape[0]

        def one(sm, tm, cs, ctl, ctr, r, f):
            packed = point_eval_packed_core(
                sm, tm, cs, ctl, ctr, r, f, xbits_s, num_bits
            )
            bits = _unpack_bits(packed, rows)
            mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, None]
            return xor_reduce(table_s & mask, axis=0)

        partial = jax.vmap(one)(s_m, t_m, cw_s, cw_tl, cw_tr, rk, fcw)
        gathered = jax.lax.all_gather(partial, "tp")
        return xor_reduce(gathered, axis=0)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("tp", None),
            P(None, "tp"),
            P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
        ),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_mp_point_step(mesh: Mesh, p2: int):
    """Multi-party (>= 3 server) multi-chip batched answer step.

    The block-sparse arbitrary-point MP eval (one bitsliced AES per
    sigma slot per 32 rows; dpf/server.go:110-144 semantics, shared
    traced core with the single-chip path) is pointwise per lane word,
    so the packed operands slice evenly across tp shards. Covers BOTH
    index-domain MP (points = row indices) and keyword-domain MP
    (points = db.Keywords rows).

    step(table (tp * rows_local, C) u32           P('tp', None),
         xp (Q, 8, p2, 16, NW)                    P('dp', None, None, None, 'tp'),
         rk4 (Q, 4, 11, 8, 1, 16, 1)              P('dp'),
         ksel / bytesel (Q, 4, NW)                P('dp', None, 'tp'),
         present / cwm (Q, p2, NW)                P('dp', None, 'tp'))
      -> (Q, C) uint32 P('dp').
    """
    from ..dpf.device import _unpack_bits, mp_point_packed_core

    def local(table_s, xp, rk4, ksel, bytesel, present, cwm):
        rows = table_s.shape[0]

        def one(x, r, k, b, pr, c):
            y = mp_point_packed_core(x, r, k, b, pr, c, p2)
            bits = _unpack_bits(y, rows)
            mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, None]
            return xor_reduce(table_s & mask, axis=0)

        partial = jax.vmap(one)(xp, rk4, ksel, bytesel, present, cwm)
        gathered = jax.lax.all_gather(partial, "tp")
        return xor_reduce(gathered, axis=0)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("tp", None),
            P("dp", None, None, None, "tp"),
            P("dp"),
            P("dp", None, "tp"),
            P("dp", None, "tp"),
            P("dp", None, "tp"),
            P("dp", None, "tp"),
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
    XOR-combines over ICI. Keyword and multi-party (>= 3 server) batches
    ride their own sharded point-eval steps (make_sharded_point_step /
    make_sharded_mp_point_step); only tiny-domain queries fall back to
    the host path, with identical semantics throughout.
    """

    # the service routes uniform >= 3-party batches here whole (the
    # sharded MP point step) instead of answering per share
    batch_accepts_multi_party = True

    def __init__(self, db, mesh: Mesh | None = None, tp: int | None = None,
                 dp: int = 1, compat_w: int = 128, compat_max_tail: int = 3,
                 compat_q_chunk: int = 16, fast_stacked: bool = True):
        if mesh is None:
            n = (tp or len(jax.devices()) // dp) * dp
            mesh = make_mesh(n, dp=dp)
        self.db = db
        self.mesh = mesh
        self.n_shards = mesh.shape["tp"]
        self.dp = mesh.shape["dp"]
        # shared-key root-start batches ride the r4 STACKED tail kernel
        # per shard (same per-chip efficiency as single-chip serving);
        # False = the r3 per-query tail, kept for A/B
        self.fast_stacked = fast_stacked
        # cascade geometry of the compat root-start step (see
        # TpuPirServer compat_pallas_* for the single-chip rationale)
        self.compat_w = compat_w
        self.compat_max_tail = compat_max_tail
        self.compat_q_chunk = compat_q_chunk
        self._tables: dict[tuple, object] = {}
        self._perms: dict[tuple, object] = {}
        self._steps: dict[tuple, object] = {}
        # root-start paths (2^k-way tp axis): (g, depth|nbd) ->
        # (device table, per-shard padded length[, cascade geometry])
        self._root_tables: dict[tuple, tuple] = {}
        self._root_steps: dict[tuple, object] = {}
        self._compat_root_tables: dict[tuple, tuple] = {}
        self._compat_root_steps: dict[tuple, object] = {}
        # keyword / multi-party point-eval paths
        self._kw_planes: dict[tuple, object] = {}
        self._point_steps: dict[int, object] = {}
        self._mp_steps: dict[int, object] = {}
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
            for (g, depth, n_blk, stk), (tbl, padded_len) in list(
                    self._root_tables.items()):
                pos, vals = self._root_update_rows(idxs, g, depth, padded_len,
                                                   n_blk, stk)
                if pos is None:
                    continue
                self._root_tables[(g, depth, n_blk, stk)] = (
                    tbl.at[jnp.asarray(pos)].set(jnp.asarray(vals)),
                    padded_len,
                )
            for (g, nbd), (tbl, padded_len, w, tails) in list(
                    self._compat_root_tables.items()):
                pos, vals = self._compat_root_update_rows(
                    idxs, g, nbd, padded_len, w, tails)
                if pos is None:
                    continue
                self._compat_root_tables[(g, nbd)] = (
                    tbl.at[jnp.asarray(pos)].set(jnp.asarray(vals)),
                    padded_len, w, tails,
                )

    def _compat_root_update_rows(self, idxs, g, nbd, padded_len, w, tails):
        """Storage positions + fresh row bytes for changed rows in a
        compat root-start sharded u8 table."""
        from ..dpf.device import _compat_perm_pallas

        h = self.db.db_size // g
        r = np.unique(idxs // g)
        r = r[r < h]
        if not len(r):
            return None, None
        shard_levels = self.n_shards.bit_length() - 1
        d_local = nbd - shard_levels
        rows_per_shard = 1 << d_local
        s = r // rows_per_shard
        r_loc = r % rows_per_shard
        pos = np.empty(len(r), dtype=np.int64)
        for sh in np.unique(s):
            local_h = min(max(h - int(sh) * rows_per_shard, 0),
                          rows_per_shard)
            perm = _compat_perm_pallas(d_local, local_h, w, tuple(tails))
            m = s == sh
            pos[m] = int(sh) * padded_len + perm[r_loc[m]]
        row_bytes = g * self.db.slot_bytes
        vals = self.db.data[: h * g].reshape(h, row_bytes)[r]
        return pos, vals

    def _root_update_rows(self, idxs, g, depth, padded_len, n_blk=1,
                          stacked_tail=None):
        """Storage positions + fresh row bytes for changed rows in a
        root-start sharded u8 table (one scatter per layout)."""
        from ..dpf.device import (
            _fast_leaf_perm_root,
            _fast_leaf_perm_root_stacked,
        )

        h = self.db.db_size // g
        r = np.unique(idxs // g)
        r = r[r < h]
        if not len(r):
            return None, None
        shard_levels = self.n_shards.bit_length() - 1
        d_local = depth - shard_levels
        rows_per_shard = (128 * n_blk) << d_local
        s = r // rows_per_shard
        r_loc = r % rows_per_shard
        pos = np.empty(len(r), dtype=np.int64)
        for sh in np.unique(s):
            local_h = min(max(h - int(sh) * rows_per_shard, 0),
                          rows_per_shard)
            perm = (
                _fast_leaf_perm_root_stacked(d_local, local_h, n_blk,
                                             stacked_tail)
                if stacked_tail is not None
                else _fast_leaf_perm_root(d_local, local_h, n_blk)
            )
            m = s == sh
            pos[m] = int(sh) * padded_len + perm[r_loc[m]]
        row_bytes = g * self.db.slot_bytes
        vals = self.db.data[: h * g].reshape(h, row_bytes)[r]
        return pos, vals

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

    def _stacked_tail_for(self, depth: int, n_blk: int) -> int | None:
        """Stacked-kernel tail depth for this layout, or None when the
        engine serves through the r3 per-query tail (fast_stacked=False).
        Part of the root-table cache key: the two kernels want different
        storage orders."""
        if not self.fast_stacked:
            return None
        from ..models.pipeline import stacked_fast_geometry

        shard_levels = self.n_shards.bit_length() - 1
        _, tail = stacked_fast_geometry(depth - shard_levels, n_blk)
        return tail

    def _root_table(self, group_size: int, depth: int, n_blk: int = 1):
        from jax.sharding import NamedSharding

        stacked_tail = self._stacked_tail_for(depth, n_blk)
        key = (group_size, depth, n_blk, stacked_tail)
        if key not in self._root_tables:
            with self._lock:
                if key not in self._root_tables:
                    shard_levels = self.n_shards.bit_length() - 1
                    table = build_sharded_root_table_u8(
                        self.db.data, self.db.db_size, group_size,
                        self.db.slot_bytes, depth, shard_levels,
                        n_blk=n_blk, stacked_tail=stacked_tail,
                    )
                    padded_len = table.shape[0] // self.n_shards
                    dev = jax.device_put(
                        jnp.asarray(table),
                        NamedSharding(self.mesh, P("tp", None)),
                    )
                    self._root_tables[key] = (dev, padded_len)
        return self._root_tables[key][0]

    def _root_step(self, layout):
        key = (layout.depth, layout.total, layout.shared_rk,
               layout.leaf_blocks, self.fast_stacked)
        if key not in self._root_steps:
            shard_levels = self.n_shards.bit_length() - 1
            make = (make_sharded_fast_root_stacked_step if self.fast_stacked
                    else make_sharded_fast_root_step)
            self._root_steps[key] = make(
                self.mesh, layout, shard_levels,
                interpret=jax.default_backend() != "tpu",
            )
        return self._root_steps[key]

    def _root_applicable(self, queries) -> bool:
        """Shared-key fast batches on a 2^k-way tp axis ride the
        root-start step (the single-chip serving kernels per shard)."""
        from ..server import TpuPirServer

        q0 = queries[0]
        if q0.key_fast is None or self.n_shards & (self.n_shards - 1):
            return False
        shard_levels = self.n_shards.bit_length() - 1
        # d_local >= 5 keeps every packed leaf word fully occupied (32
        # leaves/word): below that the word stride (32) and the local
        # storage perm (2^d_local per plane position) disagree and the
        # spare lanes would XOR garbage against real rows
        if q0.key_fast.depth < shard_levels + 5:
            return False
        return TpuPirServer._batch_shares_prf_keys(queries)

    def _compat_root_geometry(self, q0):
        """(num_bits, skip, nbd) of a compat query, or None if the compat
        root-start step cannot shard this domain."""
        from ..dpf.device import compat_skip_levels

        from ..utils.bits import num_bits_for_height

        if self.n_shards & (self.n_shards - 1):
            return None
        shard_levels = self.n_shards.bit_length() - 1
        h = self.db.db_size // q0.group_size
        num_bits = len(q0.key_two_party.cw)
        # the table geometry must come from the DATABASE, not the key: a
        # crafted cw count would otherwise size a 2^num_bits-row sharded
        # table build (remote-DoS class; cf. server.validate_fast_key_geometry)
        if num_bits != num_bits_for_height(h):
            return None
        skip = compat_skip_levels(num_bits, h)
        nbd = num_bits - skip
        # cascade needs d_local > split = 5 + log2(w)
        if nbd - shard_levels <= 5 + int(np.log2(self.compat_w)):
            return None
        return num_bits, skip, nbd

    def _answer_batch_compat_root(self, queries, geometry):
        from ..dpf.device import compat_stage_plan, make_compat_payload_batch
        from ..slot import Slot
        from ..utils import pad_tile
        from jax.sharding import NamedSharding

        num_bits, skip, nbd = geometry
        g = queries[0].group_size
        h = self.db.db_size // g
        shard_levels = self.n_shards.bit_length() - 1
        # each dp shard's slice must be <= q_chunk or a multiple of it;
        # power-of-two padding keeps the compiled shape set logarithmic
        n = len(queries)
        m = pow2_padded_len(n, self.dp, self.compat_q_chunk)
        if m > n:
            queries = pad_tile(queries, m)
        pay, layout = make_compat_payload_batch(queries, height=h)
        key = (g, nbd)
        if key not in self._compat_root_tables:
            with self._lock:
                if key not in self._compat_root_tables:
                    _, tails = compat_stage_plan(
                        nbd - shard_levels, self.compat_w,
                        self.compat_max_tail)
                    table = build_sharded_compat_table_u8(
                        self.db.data, self.db.db_size, g,
                        self.db.slot_bytes, nbd, shard_levels,
                        self.compat_w, tails,
                    )
                    dev = jax.device_put(
                        jnp.asarray(table),
                        NamedSharding(self.mesh, P("tp", None)),
                    )
                    self._compat_root_tables[key] = (
                        dev, table.shape[0] // self.n_shards,
                        self.compat_w, tails,
                    )
        with self._lock:
            table = self._compat_root_tables[key][0]
        skey = (num_bits, skip, layout.total)
        if skey not in self._compat_root_steps:
            self._compat_root_steps[skey] = make_sharded_compat_root_step(
                self.mesh, layout, shard_levels, w=self.compat_w,
                max_tail=self.compat_max_tail, q_chunk=self.compat_q_chunk,
                interpret=jax.default_backend() != "tpu",
            )
        out = np.asarray(self._compat_root_steps[skey](table,
                                                       jnp.asarray(pay)))
        sb = self.db.slot_bytes
        return [
            _shared_result(sb, [Slot(out[i, c * sb:(c + 1) * sb].tobytes())
                                for c in range(g)])
            for i in range(n)
        ]

    def _answer_batch_fast_root(self, queries):
        from ..dpf.device import make_fast_payload_batch
        from ..slot import Slot

        g = queries[0].group_size
        pay, layout = make_fast_payload_batch(queries, shared_rk=True)
        with self._lock:
            table = self._root_table(g, queries[0].key_fast.depth,
                                     layout.leaf_blocks)
        out = np.asarray(self._root_step(layout)(table, jnp.asarray(pay)))
        sb = self.db.slot_bytes
        return [
            _shared_result(sb, [Slot(out[i, c * sb:(c + 1) * sb].tobytes())
                                for c in range(g)])
            for i in range(len(queries))
        ]

    def _perm(self, kind: str, d_levels: int, per_shard_nodes: int,
              rows_per_shard: int, n_blk: int = 1):
        from ..dpf.device import _fast_leaf_perm

        key = (kind, d_levels, per_shard_nodes, n_blk)
        if key not in self._perms:
            self._perms[key] = jnp.asarray(
                _fast_leaf_perm(d_levels, rows_per_shard, per_shard_nodes,
                                n_blk)
                if kind == "fast"
                else shard_local_perm(d_levels, per_shard_nodes)
            )
        return self._perms[key]

    def _mesh_applicable(self, query) -> bool:
        if not query.is_two_party or query.is_keyword_based:
            return False
        h = self.db.db_size // query.group_size
        if query.key_fast is not None:
            # engagement floor independent of the key's leaf width: below
            # a full 32-node lane word per shard make_sharded_fast_key
            # zero-pads (scan waste, bounded to ~leaf_bits/128 x), but
            # per-chip work still beats the single-host path from ~4K
            # real rows per shard (the r3 floor at 128-bit leaves)
            return h >= 32 * 128 * self.n_shards
        return h >= 32 * self.n_shards * 2  # subtree split needs headroom

    def _points_applicable(self, query) -> bool:
        """Keyword / MP point-eval sharding wants >= one full lane word
        of real rows per shard; below that the host path is cheaper."""
        return self.db.db_size // query.group_size >= 32 * self.n_shards

    def _point_rows_per_shard(self, h: int) -> int:
        """Rows per tp shard for the point-eval steps: the even row
        split rounded up to a whole 32-row lane word."""
        return -(-(-(-h // self.n_shards)) // 32) * 32

    # ---- keyword (2-party) mesh path ----

    def _kw_planes_sharded(self, group_size: int, rows_per_shard: int):
        """Branch-bit planes of the row keywords, padded to the sharded
        row count and laid out P(None, 'tp') so each shard sees exactly
        its rows' planes. Keywords are immutable under live updates
        (update_slots patches slot data only), so no patch hook."""
        from jax.sharding import NamedSharding

        from ..dpf.device import pack_point_bit_planes

        key = (group_size, rows_per_shard)
        if key not in self._kw_planes:
            with self._lock:
                if key not in self._kw_planes:
                    h = self.db.db_size // group_size
                    total = self.n_shards * rows_per_shard
                    kws = np.zeros(total, dtype=np.int64)
                    kws[:h] = np.asarray(self.db.keywords[:h], dtype=np.int64)
                    planes = pack_point_bit_planes(kws, 32)
                    self._kw_planes[key] = jax.device_put(
                        jnp.asarray(planes),
                        NamedSharding(self.mesh, P(None, "tp")),
                    )
        return self._kw_planes[key]

    def _answer_batch_keyword(self, queries):
        from ..dpf.device import make_device_point_key
        from ..ops.scan import unpack_result_u32
        from ..slot import Slot

        g = queries[0].group_size
        h = self.db.db_size // g
        rows_per_shard = self._point_rows_per_shard(h)
        table = self._sharded_table(g, rows_per_shard)
        planes = self._kw_planes_sharded(g, rows_per_shard)
        dkeys = []
        for s in queries:
            pf = dpf_host.server_initialize(s.prf_keys, 32)
            dkeys.append(make_device_point_key(pf, s.key_two_party))
        if 32 not in self._point_steps:
            self._point_steps[32] = make_sharded_point_step(self.mesh, 32)
        stack = lambda attr: jnp.stack([getattr(k, attr) for k in dkeys])
        out = np.asarray(self._point_steps[32](
            table, planes,
            stack("s_init_masks"), stack("t_init_mask"),
            stack("cw_seed_masks"), stack("cw_tl"), stack("cw_tr"),
            stack("rk_masks"), stack("fcw_mask"),
        ))
        sb = self.db.slot_bytes
        results = []
        for i in range(len(queries)):
            res = unpack_result_u32(out[i], g, sb)
            results.append(_shared_result(sb, [Slot(res[c].tobytes())
                                               for c in range(g)]))
        return results

    # ---- multi-party (>= 3 server) mesh path ----

    def _answer_batch_mp(self, queries):
        from ..dpf.device import mp_point_operands
        from ..ops.scan import unpack_result_u32
        from ..slot import Slot
        from ..utils.bits import num_bits_for_height

        q0 = queries[0]
        g = q0.group_size
        h = self.db.db_size // g
        rows_per_shard = self._point_rows_per_shard(h)
        total = self.n_shards * rows_per_shard
        table = self._sharded_table(g, rows_per_shard)
        nb = 32 if q0.is_keyword_based else num_bits_for_height(h)
        if q0.is_keyword_based:
            points = np.zeros(total, dtype=np.int64)
            points[:h] = np.asarray(self.db.keywords[:h], dtype=np.int64)
        else:
            # padded rows evaluate masked garbage points against zero
            # table rows: no contribution to the XOR scan
            points = np.arange(total, dtype=np.int64)
        ops = [mp_point_operands(
            dpf_host.server_initialize(s.prf_keys, nb),
            s.key_multi_party, points,
        ) for s in queries]
        p2 = ops[0][-1]
        if p2 not in self._mp_steps:
            self._mp_steps[p2] = make_sharded_mp_point_step(self.mesh, p2)
        stack = lambda j: jnp.stack([jnp.asarray(o[j]) for o in ops])
        out = np.asarray(self._mp_steps[p2](
            table, stack(0), stack(1), stack(2), stack(3), stack(4),
            stack(5),
        ))
        sb = self.db.slot_bytes
        results = []
        for i in range(len(queries)):
            res = unpack_result_u32(out[i], g, sb)
            results.append(_shared_result(sb, [Slot(res[c].tobytes())
                                               for c in range(g)]))
        return results

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
        n_blk = k0.fcw_masks.shape[1] if k0.fcw_masks.ndim == 4 else 1
        perm = self._perm("fast", k0.d_levels, k0.per_shard_nodes,
                          k0.rows_per_shard, n_blk)
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
            and (q.key_fast is None
                 or q.key_fast.leaf_bits == q0.key_fast.leaf_bits)
            for q in queries
        )
        if q0.key_fast is not None:
            # reject crafted depth/leaf geometry before any table build
            srv.validate_fast_key_geometry(
                q0.key_fast, self.db.db_size // q0.group_size
            )
        # the root-start paths carry their own (weaker) capacity gates,
        # so they are checked before the host-prefix paths' 32-node
        # minimum (_mesh_applicable)
        root = (uniform and q0.key_fast is not None
                and not q0.is_keyword_based and q0.is_two_party
                and self._root_applicable(queries))
        if (uniform and q0.key_fast is None and q0.is_two_party
                and not q0.is_keyword_based):
            geo = self._compat_root_geometry(q0)
            if geo is not None:
                return self._answer_batch_compat_root(queries, geo)
        if uniform and self._points_applicable(q0):
            from ..utils import pad_tile

            n = len(queries)
            m = pow2_padded_len(n, self.dp)
            if q0.is_keyword_based and q0.is_two_party:
                if m > n:
                    queries = pad_tile(queries, m)
                return self._answer_batch_keyword(queries)[:n]
            if (not q0.is_two_party
                    and len({q.key_multi_party.num_parties
                             for q in queries}) == 1):
                if m > n:
                    queries = pad_tile(queries, m)
                return self._answer_batch_mp(queries)[:n]
        if not root and (not uniform or not self._mesh_applicable(q0)):
            return [srv.private_secret_shared_query(self.db, q)
                    for q in queries]
        # dp requires Q % dp == 0, and every distinct Q compiles a fresh
        # step shape: pad by repeating to a power-of-two per-shard slice
        # (padding sliced off; the batch may be smaller than the pad
        # needed — n=1, dp=3 — so tile the whole batch as needed).
        n = len(queries)
        m = pow2_padded_len(n, self.dp)
        if m > n:
            from ..utils import pad_tile

            queries = pad_tile(queries, m)
        if root:
            return self._answer_batch_fast_root(queries)[:n]
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
