"""Device (TPU) DPF evaluation: full-domain expansion and batched point eval.

The reference server expands a DPF query by re-walking the evaluation tree
from the root for every row (db.go:128-171): O(H log H) AES calls. Here the
tree is expanded breadth-first — every level doubles the node set — for
O(H) AES calls total, with all nodes of a level evaluated bitsliced in
uint32 lanes (see bitslice.py). Three design points:

* **Prefix pruning.** Only nodes whose subtree intersects [0, height) are
  expanded. The first few levels run on the host (exact numpy AES, natural
  node order) until >=32 live nodes exist; the rest run on device. This
  also absorbs the reference's `numBits = log2(h)+1` convention
  (query.go:61), which doubles the domain for power-of-two heights.

* **Storage order.** The device concatenates [left children | right
  children] each level, so leaf x of subtree s lands at storage position
  bitrev(x_low) * num_subtrees + s. A precomputed gather permutation
  restores natural row order at the leaf stage.

* **Leaf parity only.** PIR needs bit[row] = (eval % 2 == 0) (db.go:142).
  The parity of the Go-Varint leaf conversion depends only on two bits of
  seed byte 0 and the 8 continuation bits (see utils.bits), so the leaf
  stage is a handful of plane ops; full integer eval stays on the host
  golden path (host.eval_full_domain).

Batched point evaluation (``eval_points_device``) walks all levels with a
data-dependent branch select instead — used for keyword-based queries
where the domain (2^32) cannot be fully expanded (db.go:119-135).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import GO_UINT_BITS
from . import host as dpf_host
from .aes_host import key_schedule
from .bitslice import aes_encrypt_planes, blocks_to_planes, key_masks

_FULL = np.uint32(0xFFFFFFFF)


# --------------------------------------------------------------------------
# Shared plane-level building blocks
# --------------------------------------------------------------------------

def _prf_triple(seeds, rk_masks):
    """Bitsliced MMO PRG: seeds (8,16,NW) -> out (8,3,16,NW).

    The PRF-slot axis sits *before* the byte axis so that (byte, lane)
    occupy the TPU (sublane, lane) tile — full VPU utilisation.
    """
    x = seeds[:, None, :, :]
    enc = aes_encrypt_planes(x, rk_masks)
    return enc ^ x


def _children(out, t_plane, cw_seed_mask, cw_tl, cw_tr):
    """Split PRF output into corrected (sL, tL, sR, tR).

    out: (8,3,16,NW); t_plane: (NW,) packed parent t bits;
    cw_seed_mask: (8,16,1) 0/~0 masks; cw_tl/cw_tr: scalar 0/~0 masks.
    Layout (dpf/client.go:99-116): sL = block0[0:16], tL = block1 byte0,
    sR = block1 bytes1..15 ++ block2 byte0, tR = block2 byte1.
    """
    s_l = out[:, 0, :, :]
    t_l = out[0, 1, 0, :]
    s_r = jnp.concatenate([out[:, 1, 1:16, :], out[:, 2, 0:1, :]], axis=1)
    t_r = out[0, 2, 1, :]

    corr = t_plane[None, None, :] & cw_seed_mask
    s_l = s_l ^ corr
    s_r = s_r ^ corr
    t_l = t_l ^ (t_plane & cw_tl)
    t_r = t_r ^ (t_plane & cw_tr)
    return s_l, t_l, s_r, t_r


def _leaf_select_bits(seeds, t_plane, fcw_mask):
    """Packed PIR selection bits: bit = (leaf value % 2 == 0).

    Varint parity = (byte0.bit1 ^ byte0.bit0) unless all 8 continuation
    bits are set (value 0); final value parity adds t * (FinalCW & 1).
    """
    allcont = seeds[7, 0]
    for i in range(1, 8):
        allcont = allcont & seeds[7, i]
    parity_s = (seeds[0, 0] ^ seeds[1, 0]) & ~allcont
    leaf_parity = parity_s ^ (t_plane & fcw_mask)
    return ~leaf_parity  # inverted convention (db.go:142)


def _unpack_bits(packed, n):
    """(NW,) uint32 -> (32*NW,) uint8 (then caller slices/gathers)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, None] >> shifts[None, :]) & jnp.uint32(1)
    return bits.reshape(-1).astype(jnp.uint8)


# --------------------------------------------------------------------------
# Full-domain expansion (index-based queries)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class ExpandPlan:
    """Geometry of a pruned breadth-first expansion."""

    num_bits: int
    height: int
    host_levels: int  # levels expanded on host (natural order)
    m_nodes: int  # live nodes at host_levels
    m_padded: int  # padded to a multiple of 32
    device_levels: int


def make_plan(num_bits: int, height: int, min_device_nodes: int = 32) -> ExpandPlan:
    lvl = 0
    m = 1
    while lvl < num_bits and m < min_device_nodes:
        lvl += 1
        m = -(-height // (1 << (num_bits - lvl)))  # ceil: live nodes at lvl
    m_padded = -(-m // 32) * 32 if lvl < num_bits else m
    return ExpandPlan(num_bits, height, lvl, m, m_padded, num_bits - lvl)


@functools.lru_cache(maxsize=64)
def _leaf_perm(num_bits: int, height: int, min_device_nodes: int = 32) -> np.ndarray:
    """Gather indices: natural row -> storage position."""
    plan = make_plan(num_bits, height, min_device_nodes)
    d, m_padded = plan.device_levels, plan.m_padded
    x = np.arange(height, dtype=np.int64)
    s = x >> d
    local = x & ((1 << d) - 1)
    rev = np.zeros_like(local)
    for b in range(d):
        rev |= ((local >> b) & 1) << (d - 1 - b)
    return rev * m_padded + s


def _host_prefix(server: dpf_host.Dpf, key: dpf_host.Key2P, plan: ExpandPlan):
    """Expand levels [0, host_levels) on the host, pruned, natural order."""
    seeds = np.frombuffer(key.s_init, dtype=np.uint8)[None, :].copy()
    t_bits = np.array([key.t_init], dtype=np.uint8)
    nb = plan.num_bits
    for i in range(plan.host_levels):
        out = dpf_host.prf_blocks(seeds, server.ciphers, 3)
        flat = out.reshape(out.shape[0], 48)
        cw_i = key.cw[i]
        cw_seed = np.frombuffer(cw_i[:16], dtype=np.uint8)
        t_mask = t_bits.astype(np.uint8)[:, None]
        s_l = flat[:, 0:16] ^ cw_seed[None, :] * t_mask
        s_r = flat[:, 17:33] ^ cw_seed[None, :] * t_mask
        t_l = (flat[:, 16] & 1) ^ (t_bits & cw_i[16])
        t_r = (flat[:, 33] & 1) ^ (t_bits & cw_i[17])
        # interleave children -> natural order
        seeds = np.stack([s_l, s_r], axis=1).reshape(-1, 16)
        t_bits = np.stack([t_l, t_r], axis=1).reshape(-1).astype(np.uint8)
        live = -(-plan.height // (1 << (nb - i - 1)))
        seeds = seeds[:live]
        t_bits = t_bits[:live]
    return seeds, t_bits


@dataclass
class DeviceKey2P:
    """Device-ready arrays for one server's DPF share."""

    plan: ExpandPlan
    seeds0: np.ndarray  # (8, 16, NW0) packed level-`host_levels` seeds
    t0: np.ndarray  # (NW0,) packed t bits
    cw_seed_masks: np.ndarray  # (d, 8, 16, 1)
    cw_tl: np.ndarray  # (d,)
    cw_tr: np.ndarray  # (d,)
    rk_masks: np.ndarray  # (11, 8, 3, 16, 1)
    fcw_mask: np.ndarray  # scalar uint32
    perm: np.ndarray  # (height,) natural -> storage gather
    host_bits: np.ndarray | None  # fallback when device_levels == 0


def _pack_t(t_bits: np.ndarray, m_padded: int) -> np.ndarray:
    padded = np.zeros(m_padded, dtype=np.uint32)
    padded[: len(t_bits)] = t_bits
    w = padded.reshape(-1, 32)
    return (w << np.arange(32, dtype=np.uint32)).sum(axis=1, dtype=np.uint32)


def _cw_masks(key: dpf_host.Key2P, start: int):
    cws = key.cw[start:]
    d = len(cws)
    seed_masks = np.zeros((d, 8, 16, 1), dtype=np.uint32)
    tl = np.zeros(d, dtype=np.uint32)
    tr = np.zeros(d, dtype=np.uint32)
    for i, cw in enumerate(cws):
        b = np.frombuffer(cw[:16], dtype=np.uint8)
        bits = ((b[None, :] >> np.arange(8, dtype=np.uint8)[:, None]) & 1).astype(np.uint32)
        seed_masks[i, :, :, 0] = bits * _FULL
        tl[i] = _FULL if cw[16] & 1 else 0
        tr[i] = _FULL if cw[17] & 1 else 0
    return seed_masks, tl, tr


def prf_key_masks(server: dpf_host.Dpf) -> np.ndarray:
    """(11, 8, 3, 16, 1) round-key masks for the first 3 fixed PRF keys.

    Slot axis before byte axis — see _prf_triple."""
    rks = np.stack([key_schedule(c.key) for c in server.ciphers[:3]])
    m = key_masks(rks)  # (11, 8, 16, 3)
    return np.ascontiguousarray(m.transpose(0, 1, 3, 2))[..., None]


def make_device_key(
    server: dpf_host.Dpf,
    key: dpf_host.Key2P,
    height: int,
    min_device_nodes: int = 32,
) -> DeviceKey2P:
    plan = make_plan(server.num_bits, height, min_device_nodes)
    seeds, t_bits = _host_prefix(server, key, plan)

    if plan.device_levels == 0:
        # pure-host: compute bits directly (tiny domains)
        from ..utils.bits import go_varint_vec

        vals = go_varint_vec(np.ascontiguousarray(seeds[:, :8])) + t_bits.astype(
            np.int64
        ) * key.final_cw
        host_bits = ((vals & 1) == 0)[:height].astype(np.uint8)
        return DeviceKey2P(plan, None, None, None, None, None, None, None, None,
                           host_bits)

    pad = plan.m_padded - seeds.shape[0]
    if pad:
        seeds = np.concatenate([seeds, np.zeros((pad, 16), dtype=np.uint8)])
        t_bits = np.concatenate([t_bits, np.zeros(pad, dtype=np.uint8)])

    seed_planes = blocks_to_planes(seeds)
    t_packed = _pack_t(t_bits, plan.m_padded)
    cw_seed_masks, tl, tr = _cw_masks(key, plan.host_levels)
    fcw = np.uint32(_FULL if (key.final_cw & 1) else 0)
    perm = _leaf_perm(plan.num_bits, height, min_device_nodes)

    return DeviceKey2P(
        plan=plan,
        seeds0=seed_planes,
        t0=t_packed,
        cw_seed_masks=cw_seed_masks,
        cw_tl=tl,
        cw_tr=tr,
        rk_masks=prf_key_masks(server),
        fcw_mask=fcw,
        perm=perm,
        host_bits=None,
    )


@jax.jit
def _level_step(seeds, t_plane, cw_seed_mask, cw_tl, cw_tr, rk_masks):
    """One breadth-first doubling level: (8,16,NW) -> (8,16,2NW).

    jit-cached per lane width NW, so the whole expansion needs only
    log2(H) compiled variants *total*, shared by every query and height
    (correction words and round keys are runtime arguments).
    """
    out = _prf_triple(seeds, rk_masks)
    s_l, t_l, s_r, t_r = _children(out, t_plane, cw_seed_mask, cw_tl, cw_tr)
    return (
        jnp.concatenate([s_l, s_r], axis=-1),
        jnp.concatenate([t_l, t_r], axis=-1),
    )


@jax.jit
def _leaf_stage(seeds, t_plane, fcw_mask, perm):
    packed = _leaf_select_bits(seeds, t_plane, fcw_mask)
    bits = _unpack_bits(packed, packed.shape[0] * 32)
    return jnp.take(bits, perm, axis=0)


def expand_query_bits(dkey: DeviceKey2P) -> jnp.ndarray:
    """(height,) uint8 selection bits, natural row order, on device."""
    if dkey.host_bits is not None:
        return jnp.asarray(dkey.host_bits)
    seeds, t_plane = dkey.seeds0, dkey.t0
    for i in range(dkey.plan.device_levels):
        seeds, t_plane = _level_step(
            seeds, t_plane, dkey.cw_seed_masks[i], dkey.cw_tl[i], dkey.cw_tr[i],
            dkey.rk_masks,
        )
    return _leaf_stage(seeds, t_plane, dkey.fcw_mask, dkey.perm)


# --------------------------------------------------------------------------
# Fast mode (early-termination DPF): device arrays + leaf stage
# --------------------------------------------------------------------------

@dataclass
class DeviceFastKey2P:
    """Device-ready arrays for a fast-mode (bit-output) DPF share."""

    plan: ExpandPlan  # over *leaves* (each leaf = 128 rows)
    height: int
    seeds0: np.ndarray
    t0: np.ndarray
    cw_seed_masks: np.ndarray
    cw_tl: np.ndarray
    cw_tr: np.ndarray
    fcw_masks: np.ndarray  # (8, 16, 1) masks of the 128-bit final CW
    rk_masks: np.ndarray  # (11, 8, 3, 16, 1) tree PRF keys
    rk_leaf: np.ndarray  # (11, 8, 16, 1) output-layer PRF key (key 3)
    perm: np.ndarray  # (height,) natural row -> flat bit position
    host_bits: np.ndarray | None


def _block_masks(block: bytes) -> np.ndarray:
    b = np.frombuffer(block, dtype=np.uint8)
    bits = ((b[None, :] >> np.arange(8, dtype=np.uint8)[:, None]) & 1).astype(np.uint32)
    return (bits * _FULL)[:, :, None]  # (8, 16, 1)


def _block_masks_wide(block: bytes) -> np.ndarray:
    """16*n-byte wide final CW -> (8, n, 16, 1) full-word bit masks."""
    b = np.frombuffer(block, dtype=np.uint8).reshape(-1, 16)
    bits = ((b[None] >> np.arange(8, dtype=np.uint8)[:, None, None]) & 1)
    return (bits.astype(np.uint32) * _FULL)[..., None]


@functools.lru_cache(maxsize=64)
def _fast_leaf_perm(depth: int, height: int, m_padded: int,
                    n_blk: int = 1) -> np.ndarray:
    """Natural row -> flat index into the unpacked (8,16,[n_blk,]NW*32)
    bit tensor (n_blk > 1 = wide leaves, block-major lanes — see
    fast_leaf_bits_flat)."""
    nw32 = (m_padded << depth) if depth else m_padded
    r = np.arange(height, dtype=np.int64)
    leaf = r // (128 * n_blk)
    within = r % (128 * n_blk)
    blk = within >> 7
    wb = within & 127
    byte_i = wb >> 3
    bit_k = wb & 7
    s = leaf >> depth
    local = leaf & ((1 << depth) - 1)
    rev = np.zeros_like(local)
    for b in range(depth):
        rev |= ((local >> b) & 1) << (depth - 1 - b)
    pos = rev * m_padded + s
    return ((bit_k * 16 + byte_i) * n_blk + blk) * nw32 + pos


def make_device_fast_key(
    server: dpf_host.Dpf,
    fkey: "dpf_host.FastKey2P",
    min_device_nodes: int = 32,
) -> DeviceFastKey2P:
    n_blk = fkey.leaf_bits // 128
    n_leaves = -(-fkey.height // fkey.leaf_bits)
    plan = make_plan(fkey.depth, n_leaves, min_device_nodes)

    # host prefix over the (depth, n_leaves) tree
    tree_key = dpf_host.Key2P(fkey.s_init, fkey.t_init, fkey.cw, 0)
    saved = server.num_bits
    server.num_bits = fkey.depth
    seeds, t_bits = _host_prefix(server, tree_key, plan)
    server.num_bits = saved

    if plan.device_levels == 0 and plan.host_levels == fkey.depth:
        blocks = dpf_host._leaf_blocks_wide(server, seeds, n_blk)
        fcw = np.frombuffer(fkey.final_cw_block, dtype=np.uint8)
        blocks = blocks ^ fcw[None, :] * t_bits[:, None]
        bits = np.unpackbits(blocks, axis=1, bitorder="little").reshape(-1)
        return DeviceFastKey2P(plan, fkey.height, None, None, None, None, None,
                               None, None, None, None,
                               bits[: fkey.height].astype(np.uint8))

    pad = plan.m_padded - seeds.shape[0]
    if pad:
        seeds = np.concatenate([seeds, np.zeros((pad, 16), dtype=np.uint8)])
        t_bits = np.concatenate([t_bits, np.zeros(pad, dtype=np.uint8)])

    rk_leaf = key_masks(key_schedule(server.ciphers[3].key)[None])  # (11,8,16,1)
    cw_seed_masks, tl, tr = _cw_masks_list(fkey.cw[plan.host_levels:])
    return DeviceFastKey2P(
        plan=plan,
        height=fkey.height,
        seeds0=blocks_to_planes(seeds),
        t0=_pack_t(t_bits, plan.m_padded),
        cw_seed_masks=cw_seed_masks,
        cw_tl=tl,
        cw_tr=tr,
        fcw_masks=(_block_masks(fkey.final_cw_block) if n_blk == 1
                   else _block_masks_wide(fkey.final_cw_block)),
        rk_masks=prf_key_masks(server),
        rk_leaf=rk_leaf,
        perm=_fast_leaf_perm(plan.device_levels, fkey.height, plan.m_padded,
                             n_blk),
        host_bits=None,
    )


def _cw_masks_list(cws: list[bytes]):
    d = len(cws)
    seed_masks = np.zeros((d, 8, 16, 1), dtype=np.uint32)
    tl = np.zeros(d, dtype=np.uint32)
    tr = np.zeros(d, dtype=np.uint32)
    for i, cw in enumerate(cws):
        seed_masks[i] = _block_masks(cw[:16])
        tl[i] = _FULL if cw[16] & 1 else 0
        tr[i] = _FULL if cw[17] & 1 else 0
    return seed_masks, tl, tr


@functools.lru_cache(maxsize=16)
def _leaf_ctr_masks(n_blk: int) -> np.ndarray:
    """(8, n_blk, 16, 1) uint32 full-word masks of LE64(b) bit planes.

    Wide-leaf CTR extension (host._leaf_blocks_wide): block b's AES input
    is seed ^ LE64(b); in the bitsliced plane layout that XOR is a
    constant mask at (bit j, block b, byte i) = bit j of byte i of
    LE64(b)."""
    ctr = np.zeros((n_blk, 16), np.uint8)
    for b in range(n_blk):
        ctr[b, :8] = np.frombuffer(b.to_bytes(8, "little"), np.uint8)
    bits = ((ctr[None] >> np.arange(8, dtype=np.uint8)[:, None, None]) & 1)
    return (bits.astype(np.uint32) * _FULL)[..., None]


def fast_leaf_bits_flat(seeds, t_plane, fcw_masks, rk_leaf):
    """Leaf stage without reordering.

    128-bit leaves (fcw_masks (8,16,1)): (8,16,NW) seeds ->
    (128*NW*32,) uint8 bits in *storage* order
    (index = (bit*16+byte)*NW*32 + leafpos).

    Wide leaves (fcw_masks (8,n_blk,16,1)): each leaf seed CTR-extends
    into n_blk MMO blocks, block-MAJOR along lanes (one bitsliced AES
    over an (8, 16, n_blk*NW) state — lane extent n_blk*NW instead of
    the leaves/32 words that shrink with leaf width); bits come out in
    storage order (index = ((bit*16 + byte)*n_blk + blk)*NW*32 +
    leafpos), matching _fast_leaf_perm/_fast_leaf_perm_root."""
    if fcw_masks.ndim == 4:  # wide leaf
        n_blk = fcw_masks.shape[1]
        nw = seeds.shape[-1]
        ctr = jnp.asarray(_leaf_ctr_masks(n_blk))
        x = jnp.concatenate(
            [seeds ^ ctr[:, b] for b in range(n_blk)], axis=-1)
        enc = aes_encrypt_planes(x, rk_leaf)
        tt = jnp.concatenate([t_plane] * n_blk, axis=-1)
        fcw = jnp.concatenate(
            [jnp.broadcast_to(fcw_masks[:, b], (8, 16, nw))
             for b in range(n_blk)], axis=-1)
        out = (enc ^ x) ^ (tt[None, None, :] & fcw)
    else:
        enc = aes_encrypt_planes(seeds, rk_leaf)
        out = (enc ^ seeds) ^ (t_plane[None, None, :] & fcw_masks)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (out[..., None] >> shifts) & jnp.uint32(1)  # (8,16,NW',32)
    return bits.reshape(-1).astype(jnp.uint8)


def fast_leaf_bits(seeds, t_plane, fcw_masks, rk_leaf, perm):
    """Leaf stage: seeds (8,16,NW) -> (height,) uint8 natural-order bits.

    The gather is expensive at serving scale; prefer fast_leaf_bits_flat
    with a storage-ordered table (scatter_rows_to_storage_order)."""
    return jnp.take(fast_leaf_bits_flat(seeds, t_plane, fcw_masks, rk_leaf),
                    perm, axis=0)


def scatter_rows_to_storage_order(rows: np.ndarray, perm: np.ndarray,
                                  flat_size: int) -> np.ndarray:
    """Permute table rows so storage-order bits scan them directly.

    rows (H, C); perm (H,) natural row -> flat bit position. Positions not
    covering a real row are zero (XOR-neutral). Returns (flat_size, C).
    """
    out = np.zeros((flat_size, rows.shape[1]), dtype=rows.dtype)
    out[perm] = rows
    return out


# --------------------------------------------------------------------------
# Packed key payloads — one upload per query instead of seven
# --------------------------------------------------------------------------
# The axon/TPU dispatch latency dominates small-query serving, so all
# per-query key material is flattened into a single uint32 vector and
# sliced back apart on device (free under jit).

@dataclass(frozen=True)
class PayloadLayout:
    nw0: int
    d_levels: int
    height: int

    @property
    def sizes(self):
        nw0, d = self.nw0, self.d_levels
        return (8 * 16 * nw0, nw0, d * 128, d, d, 1, 11 * 8 * 16 * 3)

    @property
    def total(self):
        return sum(self.sizes)


def pack_key_payload(dkey: DeviceKey2P) -> tuple[np.ndarray, PayloadLayout]:
    plan = dkey.plan
    layout = PayloadLayout(plan.m_padded // 32, plan.device_levels, plan.height)
    parts = [
        np.asarray(dkey.seeds0, dtype=np.uint32).ravel(),
        np.asarray(dkey.t0, dtype=np.uint32).ravel(),
        np.asarray(dkey.cw_seed_masks, dtype=np.uint32).ravel(),
        np.asarray(dkey.cw_tl, dtype=np.uint32).ravel(),
        np.asarray(dkey.cw_tr, dtype=np.uint32).ravel(),
        np.asarray(dkey.fcw_mask, dtype=np.uint32).ravel(),
        np.asarray(dkey.rk_masks, dtype=np.uint32).ravel(),
    ]
    payload = np.concatenate(parts)
    assert payload.shape[0] == layout.total
    return payload, layout


def unpack_key_payload(payload, layout: PayloadLayout):
    """Device-side inverse of pack_key_payload (jnp slicing, jit-free)."""
    nw0, d = layout.nw0, layout.d_levels
    sizes = layout.sizes
    offs = np.cumsum((0,) + sizes)
    seg = [payload[offs[i]:offs[i + 1]] for i in range(len(sizes))]
    return (
        seg[0].reshape(8, 16, nw0),
        seg[1],
        seg[2].reshape(d, 8, 16, 1),
        seg[3],
        seg[4],
        seg[5][0],
        seg[6].reshape(11, 8, 3, 16, 1),
    )


def make_key_payload(
    server: dpf_host.Dpf, key: dpf_host.Key2P, height: int, min_device_nodes: int = 32
):
    """Host keygen-to-payload shortcut: returns (payload, layout) or a
    host-bits DeviceKey2P for tiny domains."""
    dkey = make_device_key(server, key, height, min_device_nodes)
    if dkey.host_bits is not None:
        return dkey, None
    return pack_key_payload(dkey)


# --------------------------------------------------------------------------
# Root-start expansion (v2): the whole tree on device, including the first
# five sub-word levels, so the host builds payloads with pure vector ops.
# --------------------------------------------------------------------------
# Levels 0..4 hold 2^i live nodes in the LOW BITS of a single uint32 word
# per plane; the doubling step is s' = (sL & lo) | ((sR & lo) << 2^i)
# (children land at +2^i — the [lefts | rights] storage convention within
# one word). From level 5 on, the word-axis concat used everywhere else.
# Leaf storage position is then exactly bit_reverse(leaf, depth).


def _expand_root_level(seeds, t_plane, cw_seed_mask, cw_tl, cw_tr, rk_masks, i):
    out = _prf_triple(seeds, rk_masks)
    s_l, t_l, s_r, t_r = _children(out, t_plane, cw_seed_mask, cw_tl, cw_tr)
    if i < 5:
        lo = jnp.uint32((1 << (1 << i)) - 1)
        shift = jnp.uint32(1 << i)
        seeds = (s_l & lo) | ((s_r & lo) << shift)
        t_plane = (t_l & lo) | ((t_r & lo) << shift)
    else:
        seeds = jnp.concatenate([s_l, s_r], axis=-1)
        t_plane = jnp.concatenate([t_l, t_r], axis=-1)
    return seeds, t_plane


def expand_planes_from_root(seeds, t_plane, cw_seed_masks, cw_tl, cw_tr,
                            rk_masks, depth: int):
    """seeds (8,16,1) with bit0 = s_init bits -> (8,16,2^max(0,depth-5))."""
    for i in range(depth):
        seeds, t_plane = _expand_root_level(
            seeds, t_plane, cw_seed_masks[i], cw_tl[i], cw_tr[i], rk_masks, i
        )
    return seeds, t_plane


@functools.lru_cache(maxsize=64)
def _fast_leaf_perm_root(depth: int, height: int, n_blk: int = 1) -> np.ndarray:
    """Natural row -> flat bit index for root-start expansion.

    flat index = ((bit*16 + byte)*n_blk + blk) * 2^depth
                 + bit_reverse(leaf, depth),
    where each leaf covers 128*n_blk rows (blk = CTR block within the
    leaf, block-MAJOR along lanes — see fast_leaf_bits_flat); n_blk = 1
    is the classic 128-row-leaf layout.
    """
    r = np.arange(height, dtype=np.int64)
    leaf = r // (128 * n_blk)
    within = r % (128 * n_blk)
    blk = within >> 7
    wb = within & 127
    byte_i = wb >> 3
    bit_k = wb & 7
    rev = np.zeros_like(leaf)
    for b in range(depth):
        rev |= ((leaf >> b) & 1) << (depth - 1 - b)
    return ((bit_k * 16 + byte_i) * n_blk + blk) * (1 << depth) + rev


@dataclass(frozen=True)
class FastRootLayout:
    """Bit-packed root-start payload: 187 + 4*depth uint32 words per query.

    Key material is shipped packed (16-byte blocks as 4 uint32 words,
    t-bit vectors as one word) and expanded into plane masks *on device*
    inside the jit — a 32x smaller host->device transfer than shipping
    the masks themselves, which dominates dispatch latency on relay-
    attached TPUs.
    """

    depth: int
    height: int
    # True when every share in the batch carries the SAME PRF keys (the
    # batch-keygen and single-client cases): the round-key masks are then
    # expanded once for the whole batch instead of per query — per-query
    # masks pad to ~2 MiB/query under (8,128) tiling, which OOMed HBM at
    # batch 4096.
    shared_rk: bool = False
    # leaf width in 128-bit PRG blocks (host.FastKey2P.leaf_bits // 128):
    # wide leaves terminate the tree earlier, trading tree AES for
    # nothing (leaf AES is fixed at height/128 blocks either way).
    leaf_blocks: int = 1

    @property
    def sizes(self):
        d = self.depth
        # s_init, t_init, cw blocks, cw_tl bits, cw_tr bits, final CW,
        # tree round keys (3 x 11 x 16B), leaf round keys (11 x 16B)
        return (4, 1, 4 * d, 1, 1, 4 * self.leaf_blocks, 132, 44)

    @property
    def total(self):
        return sum(self.sizes)

    @property
    def flat_bits(self):
        return (128 * self.leaf_blocks) << self.depth


# (bit, byte) -> shift into the 4-word little-endian packing of a block
_BLOCK_SHIFTS = ((np.arange(16) % 4) * 8 + np.arange(8)[:, None]).astype(np.uint32)
_BLOCK_WORD = (np.arange(16) // 4).astype(np.int32)


def _unpack_block_bits(words):
    """(..., 4) uint32 packed 16-byte blocks -> (..., 8, 16) bits {0,1}."""
    w = jnp.take(words, _BLOCK_WORD, axis=-1)  # (..., 16)
    return (w[..., None, :] >> _BLOCK_SHIFTS) & jnp.uint32(1)


def _unpack_block_masks(words):
    """(..., 4) uint32 -> (..., 8, 16) masks 0/0xFFFFFFFF."""
    return jnp.uint32(0) - _unpack_block_bits(words)


def _unpack_bit_masks(word, n):
    """scalar uint32 -> (n,) masks 0/0xFFFFFFFF from its low n bits."""
    bits = (word >> jnp.arange(n, dtype=jnp.uint32)) & jnp.uint32(1)
    return jnp.uint32(0) - bits


def unpack_fast_root_payload(payload, layout: FastRootLayout):
    """Device-side unpack + mask expansion (all shapes static under jit)."""
    d = layout.depth
    offs = np.cumsum((0,) + layout.sizes)
    seg = [payload[offs[i]:offs[i + 1]] for i in range(len(layout.sizes))]
    seeds = _unpack_block_bits(seg[0])[..., None]  # (8,16,1) bit values
    t_init = seg[1]  # (1,) mask word
    cw_s = _unpack_block_masks(seg[2].reshape(d, 4))[..., None] if d else (
        jnp.zeros((0, 8, 16, 1), jnp.uint32))
    cw_tl = _unpack_bit_masks(seg[3][0], d)
    cw_tr = _unpack_bit_masks(seg[4][0], d)
    if layout.leaf_blocks > 1:  # wide leaf: (8, n_blk, 16, 1)
        fcw = jnp.transpose(
            _unpack_block_masks(seg[5].reshape(layout.leaf_blocks, 4)),
            (1, 0, 2),
        )[..., None]
    else:
        fcw = _unpack_block_masks(seg[5])[..., None]  # (8,16,1)
    rk_tree = _unpack_block_masks(seg[6].reshape(3, 11, 4))  # (3,11,8,16)
    rk = jnp.transpose(rk_tree, (1, 2, 0, 3))[..., None]  # (11,8,3,16,1)
    rk_leaf = _unpack_block_masks(seg[7].reshape(11, 4))[..., None]
    return seeds, t_init, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf


def unpack_fast_root_payload_lanes(payloads, layout: FastRootLayout):
    """Batched device-side unpack with the QUERY axis in lanes.

    The vmapped per-query unpack/head puts Q at axis 0, leaving the word
    axis (NW = 1 for the first five levels) in the TPU lane dimension —
    up to 128x lane-padding waste, measured as ~2/3 of fast-mode
    expansion time (benchmarks_fast_roof.py). This unpack instead emits
    arrays whose LAST axis is Q, so every elementwise op in the head
    runs on full (16, Q) tiles regardless of tree level.

    payloads (Q, total) uint32 ->
      seeds (8,16,Q) bit values, t_init (Q,) mask words,
      cw_s (d,8,16,Q) masks, cw_tl / cw_tr (d,Q) masks,
      fcw (Q,8,16) masks (per-query, for the tail kernel).
    Round keys are not unpacked here: the shared-rk caller takes them
    from payload row 0 via unpack_fast_root_payload.
    """
    d = layout.depth
    q_n = payloads.shape[0]
    offs = np.cumsum((0,) + layout.sizes)
    seg = [payloads[:, offs[i]:offs[i + 1]] for i in range(len(layout.sizes))]
    seeds = jnp.transpose(_unpack_block_bits(seg[0]), (1, 2, 0))  # (8,16,Q)
    t_init = seg[1][:, 0]  # (Q,) mask words
    if d:
        cw = _unpack_block_masks(seg[2].reshape(q_n, d, 4))  # (Q,d,8,16)
        cw_s = jnp.transpose(cw, (1, 2, 3, 0))  # (d,8,16,Q)
    else:
        cw_s = jnp.zeros((0, 8, 16, q_n), jnp.uint32)
    lvl = jnp.arange(max(d, 1), dtype=jnp.uint32)[:d, None]
    cw_tl = jnp.uint32(0) - ((seg[3][None, :, 0] >> lvl) & jnp.uint32(1))
    cw_tr = jnp.uint32(0) - ((seg[4][None, :, 0] >> lvl) & jnp.uint32(1))
    if layout.leaf_blocks > 1:  # wide leaf: (Q, 8, n_blk, 16)
        fcw = jnp.transpose(
            _unpack_block_masks(seg[5].reshape(q_n, layout.leaf_blocks, 4)),
            (0, 2, 1, 3),
        )
    else:
        fcw = _unpack_block_masks(seg[5])  # (Q,8,16)
    return seeds, t_init, cw_s, cw_tl, cw_tr, fcw


def _expand_root_level_lanes(seeds, t_plane, cw_seed_mask, cw_tl, cw_tr,
                             rk_masks, i: int, w: int):
    """One root-expansion level over a flattened (word, query) lane axis.

    seeds (8,16,W*Q) / t_plane (W*Q,) hold W = max(1, 2^i // 32) packed
    words per query, word-major (flat index w*Q + q, so per-query masks
    tile along the flat axis). cw_seed_mask (8,16,Q), cw_tl/cw_tr (Q,).
    rk_masks is (11,8,3,16,1) batch-shared, or (11,8,3,16,Q) per-query
    (multi-tenant batches) — tiled along the flat axis like the cw masks.
    Identical algebra to _expand_root_level — only the batching layout
    differs — so outputs are bit-for-bit equal after regrouping.
    """
    if w > 1:
        cw_seed_mask = jnp.tile(cw_seed_mask, (1, 1, w))
        cw_tl = jnp.tile(cw_tl, w)
        cw_tr = jnp.tile(cw_tr, w)
        if rk_masks.shape[-1] != 1:
            rk_masks = jnp.tile(rk_masks, (1, 1, 1, 1, w))
    out = _prf_triple(seeds, rk_masks)
    s_l, t_l, s_r, t_r = _children(out, t_plane, cw_seed_mask, cw_tl, cw_tr)
    if i < 5:
        lo = jnp.uint32((1 << (1 << i)) - 1)
        shift = jnp.uint32(1 << i)
        seeds = (s_l & lo) | ((s_r & lo) << shift)
        t_plane = (t_l & lo) | ((t_r & lo) << shift)
    else:
        # [L words, R words] along the flat axis keeps word-major order:
        # per query, word j < W comes from L, j >= W from R — the same
        # word layout _expand_root_level produces per query.
        seeds = jnp.concatenate([s_l, s_r], axis=-1)
        t_plane = jnp.concatenate([t_l, t_r], axis=-1)
    return seeds, t_plane


def expand_root_head_lanes(payloads, layout: FastRootLayout, rk_masks,
                           head_levels: int):
    """Batch-shared-key root head with Q in lanes (full VPU tiles).

    Returns tail-kernel-ready arrays: seeds (Q,8,16,NW0), t (Q,1,NW0),
    cw_s (Q,tail,8,16,1), cw_tl / cw_tr (Q,tail), fcw (Q,8,16,1), where
    NW0 = max(1, 2^head_levels // 32) and tail = depth - head_levels.
    """
    q_n = payloads.shape[0]
    seeds, t, cw_s, cw_tl, cw_tr, fcw = unpack_fast_root_payload_lanes(
        payloads, layout)
    for i in range(head_levels):
        w = max(1, (1 << i) // 32)
        seeds, t = _expand_root_level_lanes(
            seeds, t, cw_s[i], cw_tl[i], cw_tr[i], rk_masks, i, w)
    nw0 = max(1, (1 << head_levels) // 32)
    seeds = seeds.reshape(8, 16, nw0, q_n).transpose(3, 0, 1, 2)
    t = t.reshape(nw0, q_n).T[:, None, :]
    cw_s_tail = jnp.transpose(cw_s[head_levels:], (3, 0, 1, 2))[..., None]
    cw_tl_tail = cw_tl[head_levels:].T
    cw_tr_tail = cw_tr[head_levels:].T
    return seeds, t, cw_s_tail, cw_tl_tail, cw_tr_tail, fcw[..., None]


def unpack_fast_root_payload_lanes_rk(payloads, layout: FastRootLayout):
    """Per-query round-key masks with Q in lanes (multi-tenant batches):
    payloads (Q, total) -> rk (11,8,3,16,Q), rk_leaf (11,8,16,Q).
    The lane-dense layout wastes nothing under (8,128) tiling, unlike
    the per-query (…,16,1) masks of the vmapped path (~1 MiB of tile
    padding per query — the batch-4096 OOM)."""
    q_n = payloads.shape[0]
    offs = np.cumsum((0,) + layout.sizes)
    rk_tree = _unpack_block_masks(
        payloads[:, offs[6]:offs[7]].reshape(q_n, 3, 11, 4)
    )  # (Q,3,11,8,16)
    rk = jnp.transpose(rk_tree, (2, 3, 1, 4, 0))  # (11,8,3,16,Q)
    rkl = jnp.transpose(
        _unpack_block_masks(payloads[:, offs[7]:offs[8]].reshape(q_n, 11, 4)),
        (1, 2, 3, 0),
    )  # (11,8,16,Q)
    return rk, rkl


def regroup_rk_stacked(rk, k: int, nw0: int):
    """Per-query lane-major masks (..., Q) -> per-grid-step (S, ..., W)
    for the stacked tail kernel, W = k * nw0, lane = j*NW0 + w (each
    query's masks repeated across its nw0 lane words)."""
    q_n = rk.shape[-1]
    s_n = q_n // k
    lead = rk.shape[:-1]
    r = rk.reshape(*lead, s_n, k)
    r = jnp.broadcast_to(r[..., None], (*lead, s_n, k, nw0))
    r = r.reshape(*lead, s_n, k * nw0)
    return jnp.moveaxis(r, -2, 0)


def regroup_head_stacked(seeds, t, cw_s_tail, cw_tl_tail, cw_tr_tail, fcw,
                         k: int, nw0: int, n_blk: int):
    """Regroup post-head word-major lane arrays for the STACKED tail
    kernel (ops/pallas_expand.fast_tail_expand_stacked_pallas): k queries
    per grid step, lane-packed query-major (lane = j*NW0 + w).

    seeds (8,16,NW0*Q) / t (NW0*Q,) word-major (flat = w*Q + q, the
    _expand_root_level_lanes layout), cw_*_tail already sliced to the
    tail levels ((tail,8,16,Q) / (tail,Q)), fcw (Q,8,16) or
    (Q,8,n_blk,16). Returns seeds (S,8,1,16,W), t (S,1,1,W),
    cw_s (S,tail,8,16,W), cw_tl/cw_tr (S,tail,1,W), fcw (S,8,n_blk,16,W),
    with S = Q // k and W = k * NW0. Q must be a multiple of k.
    """
    q_n = fcw.shape[0]
    if q_n % k:
        raise ValueError(f"batch {q_n} not a multiple of group {k}")
    s_n = q_n // k
    wl = k * nw0
    seeds = seeds.reshape(8, 16, nw0, s_n, k).transpose(3, 0, 1, 4, 2)
    seeds = seeds.reshape(s_n, 8, 1, 16, wl)
    t = t.reshape(nw0, s_n, k).transpose(1, 2, 0).reshape(s_n, 1, 1, wl)
    tail = cw_s_tail.shape[0]
    cw_t = cw_s_tail.reshape(tail, 8, 16, s_n, k)
    cw_t = jnp.broadcast_to(cw_t[..., None], (tail, 8, 16, s_n, k, nw0))
    cw_t = cw_t.reshape(tail, 8, 16, s_n, wl).transpose(3, 0, 1, 2, 4)
    def _tbits(cw):
        c = cw.reshape(tail, s_n, k)
        c = jnp.broadcast_to(c[..., None], (tail, s_n, k, nw0))
        return c.reshape(tail, s_n, 1, wl).transpose(1, 0, 2, 3)
    cw_tl_t, cw_tr_t = _tbits(cw_tl_tail), _tbits(cw_tr_tail)
    if n_blk > 1:  # (Q, 8, n_blk, 16)
        fg = fcw.reshape(s_n, k, 8, n_blk, 16).transpose(0, 2, 3, 4, 1)
    else:  # (Q, 8, 16)
        fg = fcw.reshape(s_n, k, 8, 16).transpose(0, 2, 3, 1)[:, :, None]
    fg = jnp.broadcast_to(fg[..., None], (s_n, 8, n_blk, 16, k, nw0))
    fg = fg.reshape(s_n, 8, n_blk, 16, wl)
    return seeds, t, cw_t, cw_tl_t, cw_tr_t, fg


def expand_root_head_grouped(payloads, layout: FastRootLayout, rk_masks,
                             head_levels: int, k: int):
    """Batch-shared-key root head regrouped for the STACKED tail kernel:
    unpack + head walk with Q in lanes, then regroup_head_stacked."""
    seeds, t, cw_s, cw_tl, cw_tr, fcw = unpack_fast_root_payload_lanes(
        payloads, layout)
    for i in range(head_levels):
        w = max(1, (1 << i) // 32)
        seeds, t = _expand_root_level_lanes(
            seeds, t, cw_s[i], cw_tl[i], cw_tr[i], rk_masks, i, w)
    nw0 = max(1, (1 << head_levels) // 32)
    return regroup_head_stacked(
        seeds, t, cw_s[head_levels:], cw_tl[head_levels:],
        cw_tr[head_levels:], fcw, k, nw0, layout.leaf_blocks)


@functools.lru_cache(maxsize=64)
def _fast_leaf_perm_root_stacked(depth: int, height: int, n_blk: int,
                                 tail: int) -> np.ndarray:
    """Natural row -> flat bit index for the STACKED root-start path.

    The stacked tail kernel doubles branches on a leading chunk axis
    (new_chunk = parent*2 + branch, MSB-first walk), so a leaf's chunk
    index is its low `tail` bits VERBATIM while the head part keeps the
    lane-doubling bit reversal over the top `head` bits:

      flat = ((bit*2^tail*n_blk + (leaf mod 2^tail)*n_blk + blk) * 16
              + byte) * 2^head + bit_reverse(leaf >> tail, head)
    """
    head = depth - tail
    r = np.arange(height, dtype=np.int64)
    leaf = r // (128 * n_blk)
    within = r % (128 * n_blk)
    blk = within >> 7
    wb = within & 127
    byte_i = wb >> 3
    bit_k = wb & 7
    top = leaf >> tail
    c = leaf & ((1 << tail) - 1)
    rev = np.zeros_like(top)
    for b in range(head):
        rev |= ((top >> b) & 1) << (head - 1 - b)
    return (((bit_k << tail) * n_blk + c * n_blk + blk) * 16
            + byte_i) * (1 << head) + rev


def expand_fast_root_lanes_full(payloads, layout: FastRootLayout, rk_masks,
                                rk_leaf):
    """All-XLA fast expansion with Q in lanes: (Q, total) payloads ->
    (Q, 8, 16, NWf) packed leaf-output words (same convention as
    fast_tail_expand_pallas). The whole tree walk AND the leaf PRG run
    on (8, 16, W*Q) arrays — full VPU tiles at every level — with one
    (8,16,NWf,Q) -> (Q,8,16,NWf) transpose at the end. Alternative to
    the Pallas tail for batch-shared-key batches; pick by measurement
    (benchmarks_fast_roof.py / exp logs in docs/PERFORMANCE.md).
    """
    q_n = payloads.shape[0]
    seeds, t, cw_s, cw_tl, cw_tr, fcw = unpack_fast_root_payload_lanes(
        payloads, layout)
    for i in range(layout.depth):
        w = max(1, (1 << i) // 32)
        seeds, t = _expand_root_level_lanes(
            seeds, t, cw_s[i], cw_tl[i], cw_tr[i], rk_masks, i, w)
    nwf = max(1, (1 << layout.depth) // 32)
    if layout.leaf_blocks > 1:  # wide leaf (see fast_leaf_bits_flat)
        n_blk = layout.leaf_blocks
        ctr = jnp.asarray(_leaf_ctr_masks(n_blk))  # (8,n_blk,16,1)
        # block-major lanes: flat lane = blk*(NWf*Q) + word*Q + q, the
        # same (blk, word) order the Pallas tail emits per query
        x = jnp.concatenate(
            [seeds ^ ctr[:, b] for b in range(n_blk)], axis=-1)
        enc = aes_encrypt_planes(x, rk_leaf)
        fcw_t = jnp.transpose(fcw, (2, 1, 3, 0))  # (n_blk,8,16,Q)
        if nwf > 1:
            fcw_t = jnp.tile(fcw_t, (1, 1, 1, nwf))
        fcw_w = jnp.concatenate([fcw_t[b] for b in range(n_blk)], axis=-1)
        tt = jnp.concatenate([t] * n_blk, axis=-1)
        out = (enc ^ x) ^ (tt[None, None, :] & fcw_w)
        return jnp.transpose(
            out.reshape(8, 16, n_blk * nwf, q_n), (3, 0, 1, 2))
    fcw_t = jnp.transpose(fcw, (1, 2, 0))  # (8,16,Q)
    if nwf > 1:
        fcw_t = jnp.tile(fcw_t, (1, 1, nwf))
    enc = aes_encrypt_planes(seeds, rk_leaf)
    out = (enc ^ seeds) ^ (t[None, None, :] & fcw_t)
    return out.reshape(8, 16, nwf, q_n).transpose(3, 0, 1, 2)


def _bits_of_bytes_batch(data: np.ndarray) -> np.ndarray:
    """(..., n) uint8 -> (..., 8, n) bit planes {0,1} uint32 (LSB first)."""
    return (
        (data[..., None, :] >> np.arange(8, dtype=np.uint8)[:, None]) & 1
    ).astype(np.uint32)


def _u32_view(a: np.ndarray) -> np.ndarray:
    """(..., 16k) uint8 -> (..., 4k) little-endian uint32."""
    return np.ascontiguousarray(a).view("<u4")


def make_fast_payload_batch(
    shares, shared_rk: bool | None = None
) -> tuple[np.ndarray, FastRootLayout]:
    """Vectorised bit-packed payload builder for fast-mode query shares.

    All per-query host work is numpy over the whole batch; key material
    ships packed (see FastRootLayout) and mask expansion plus the whole
    tree walk happen on device (expand_planes_from_root).

    shared_rk=None detects whether every share carries the same PRF
    keys; callers that already know (or must force the non-shared
    layout, e.g. a chunk tail padded by tiling one query) pass it in so
    the compiled-shape choice never flips on padding artifacts.
    """
    from .aes_host import key_schedule_batch

    q_n = len(shares)
    k0 = shares[0].key_fast
    depth, height = k0.depth, k0.height
    if shared_rk is None:
        prf0 = tuple(bytes(k.bytes) for k in shares[0].prf_keys)
        shared_rk = all(
            tuple(bytes(k.bytes) for k in s.prf_keys) == prf0 for s in shares
        )
    layout = FastRootLayout(depth, height, shared_rk, k0.leaf_bits // 128)
    _full = np.uint32(0xFFFFFFFF)

    payload = np.zeros((q_n, layout.total), dtype=np.uint32)
    offs = np.cumsum((0,) + layout.sizes)

    s_init = np.stack([
        np.frombuffer(s.key_fast.s_init, np.uint8) for s in shares
    ])  # (Q, 16)
    payload[:, offs[0]:offs[1]] = _u32_view(s_init)
    payload[:, offs[1]] = np.array(
        [_full if s.key_fast.t_init else 0 for s in shares], np.uint32
    )

    if depth:
        cw = np.stack([
            np.frombuffer(b"".join(s.key_fast.cw), np.uint8).reshape(depth, 18)
            for s in shares
        ])  # (Q, d, 18)
        payload[:, offs[2]:offs[3]] = _u32_view(
            np.ascontiguousarray(cw[:, :, :16])
        ).reshape(q_n, depth * 4)
        lvl = np.arange(depth, dtype=np.uint32)
        payload[:, offs[3]] = (
            (cw[:, :, 16] & 1).astype(np.uint32) << lvl
        ).sum(axis=1, dtype=np.uint32)
        payload[:, offs[4]] = (
            (cw[:, :, 17] & 1).astype(np.uint32) << lvl
        ).sum(axis=1, dtype=np.uint32)

    fcw = np.stack([
        np.frombuffer(s.key_fast.final_cw_block, np.uint8) for s in shares
    ])
    payload[:, offs[5]:offs[6]] = _u32_view(fcw)

    all_keys = np.stack([
        np.frombuffer(k.bytes, np.uint8) for s in shares for k in s.prf_keys
    ])  # (4Q, 16)
    rks = key_schedule_batch(all_keys).reshape(q_n, 4, 11, 16)
    payload[:, offs[6]:offs[7]] = _u32_view(
        np.ascontiguousarray(rks[:, :3])
    ).reshape(q_n, 132)
    payload[:, offs[7]:offs[8]] = _u32_view(
        np.ascontiguousarray(rks[:, 3])
    ).reshape(q_n, 44)

    return payload, layout


@dataclass(frozen=True)
class CompatRootLayout:
    """Bit-packed root-start payload for the reference-exact (compat) mode
    (same packing rationale as FastRootLayout).

    ``skip``: leading tree levels whose RIGHT subtree provably covers no
    row. The reference's ``numBits = log2(h)+1`` convention (query.go:61)
    doubles the domain for power-of-two heights, so the root's right half
    is dead; the device walks `skip` levels keeping only the left child
    (one 1-word PRG triple each — the seed lives in lane bit 0) before
    the packed root-start expansion of the remaining ``num_bits - skip``
    levels. Halves AES and scan work at identical outputs.
    """

    num_bits: int
    height: int
    skip: int = 0

    @property
    def device_bits(self) -> int:
        return self.num_bits - self.skip

    @property
    def sizes(self):
        d = self.num_bits
        # s_init, t_init, cw blocks, cw_tl bits, cw_tr bits, final-CW
        # parity mask, tree round keys (3 x 11 x 16B)
        return (4, 1, 4 * d, 1, 1, 1, 132)

    @property
    def total(self):
        return sum(self.sizes)

    @property
    def flat_bits(self):
        return 1 << self.device_bits


def unpack_compat_root_payload(payload, layout: CompatRootLayout):
    """Device-side unpack + mask expansion (compat mode)."""
    d = layout.num_bits
    offs = np.cumsum((0,) + layout.sizes)
    seg = [payload[offs[i]:offs[i + 1]] for i in range(len(layout.sizes))]
    seeds = _unpack_block_bits(seg[0])[..., None]  # (8,16,1) bit values
    cw_s = _unpack_block_masks(seg[2].reshape(d, 4))[..., None]
    cw_tl = _unpack_bit_masks(seg[3][0], d)
    cw_tr = _unpack_bit_masks(seg[4][0], d)
    rk_tree = _unpack_block_masks(seg[6].reshape(3, 11, 4))  # (3,11,8,16)
    rk = jnp.transpose(rk_tree, (1, 2, 0, 3))[..., None]
    return seeds, seg[1], cw_s, cw_tl, cw_tr, seg[5][0], rk


@functools.lru_cache(maxsize=64)
def _compat_leaf_perm_root(num_bits: int, height: int) -> np.ndarray:
    """Natural row -> flat bit index (= bit_reverse(row)) for compat mode."""
    r = np.arange(height, dtype=np.int64)
    rev = np.zeros_like(r)
    for b in range(num_bits):
        rev |= ((r >> b) & 1) << (num_bits - 1 - b)
    return rev


def compat_skip_levels(num_bits: int, height: int) -> int:
    """Leading levels whose right subtree lies entirely outside [0, height).

    Non-zero exactly when height <= 2^(num_bits-1), i.e. for power-of-two
    heights under the reference's log2(h)+1 domain rule (query.go:61)."""
    skip = 0
    while num_bits - skip > 1 and height <= (1 << (num_bits - skip - 1)):
        skip += 1
    return skip


def compat_stage_plan(device_bits: int, w: int = 128,
                      max_tail: int = 3) -> tuple[int, tuple[int, ...]]:
    """Cascade plan for the Pallas compat expansion.

    Returns (split, tails): the XLA root-start head walks `split` levels
    (ending at exactly one chunk of `w` lane words); each Pallas stage
    then walks tails[k] levels (ops.pallas_expand.compat_stage_pallas).
    `max_tail` bounds per-stage VMEM (last level holds 2^(tail-1) chunks
    of PRG triple + gate temporaries; 3 fits ~9 MB at w=128).
    Requires device_bits > split = 5 + log2(w).
    """
    split = 5 + int(np.log2(w))
    assert 1 << (split - 5) == w, "w must be a power of two"
    rem = device_bits - split
    assert rem > 0, (device_bits, split)
    tails = []
    while rem > 0:
        t = min(max_tail, rem)
        tails.append(t)
        rem -= t
    return split, tuple(tails)


@functools.lru_cache(maxsize=64)
def _compat_perm_pallas(device_bits: int, height: int, w: int,
                        tails: tuple[int, ...]) -> np.ndarray:
    """Natural row -> flat bit index for the cascaded Pallas compat path.

    Replays the storage order of the stacked-chunk walk: in-word bits =
    first 5 levels (bit-reversed), lane word = head levels 6..split
    (concat order, latest level most significant), chunk index = the
    cascade stages' branch bits appended MSB-first per stage.
    """
    split = 5 + int(np.log2(w))
    r = np.arange(height, dtype=np.int64)
    # rev bit (i-1) = branch at level i (MSB-first path bits of r)
    rev = np.zeros_like(r)
    for b in range(device_bits):
        rev |= ((r >> b) & 1) << (device_bits - 1 - b)
    bitpos = rev & 31
    word = (rev >> 5) & (w - 1)  # head word index (levels 6..split)
    chunk = np.zeros_like(r)
    lvl = split
    for t in tails:
        b_bits = np.zeros_like(r)
        for jj in range(t):  # first level of the stage ends up MSB
            b_bits = (b_bits << 1) | ((rev >> (lvl + jj)) & 1)
        chunk = (chunk << t) | b_bits
        lvl += t
    assert lvl == device_bits
    return (chunk * w + word) * 32 + bitpos


def make_compat_payload_batch(
    shares, height: int | None = None
) -> tuple[np.ndarray, CompatRootLayout]:
    """Vectorised bit-packed payload builder for compat (reference-exact)
    shares; see make_fast_payload_batch. When `height` is given, dead
    leading levels are marked for the device-side left-child skip
    (CompatRootLayout.skip) — the payload itself is identical."""
    from .aes_host import key_schedule_batch

    q_n = len(shares)
    k0 = shares[0].key_two_party
    num_bits = len(k0.cw)
    skip = compat_skip_levels(num_bits, height) if height else 0
    layout = CompatRootLayout(num_bits, 0, skip)
    _full = np.uint32(0xFFFFFFFF)

    payload = np.zeros((q_n, layout.total), dtype=np.uint32)
    offs = np.cumsum((0,) + layout.sizes)

    s_init = np.stack([
        np.frombuffer(s.key_two_party.s_init, np.uint8) for s in shares
    ])
    payload[:, offs[0]:offs[1]] = _u32_view(s_init)
    payload[:, offs[1]] = np.array(
        [_full if s.key_two_party.t_init else 0 for s in shares], np.uint32
    )
    cw = np.stack([
        np.frombuffer(b"".join(s.key_two_party.cw), np.uint8).reshape(num_bits, 18)
        for s in shares
    ])
    payload[:, offs[2]:offs[3]] = _u32_view(
        np.ascontiguousarray(cw[:, :, :16])
    ).reshape(q_n, num_bits * 4)
    lvl = np.arange(num_bits, dtype=np.uint32)
    payload[:, offs[3]] = (
        (cw[:, :, 16] & 1).astype(np.uint32) << lvl
    ).sum(axis=1, dtype=np.uint32)
    payload[:, offs[4]] = (
        (cw[:, :, 17] & 1).astype(np.uint32) << lvl
    ).sum(axis=1, dtype=np.uint32)
    payload[:, offs[5]] = np.array(
        [_full if (s.key_two_party.final_cw & 1) else 0 for s in shares],
        np.uint32,
    )
    all_keys = np.stack([
        np.frombuffer(k.bytes, np.uint8) for s in shares for k in s.prf_keys[:3]
    ])
    rks = key_schedule_batch(all_keys).reshape(q_n, 3, 11, 16)
    payload[:, offs[6]:offs[7]] = _u32_view(
        np.ascontiguousarray(rks)
    ).reshape(q_n, 132)
    return payload, layout


@dataclass(frozen=True)
class FastPayloadLayout:
    nw0: int
    d_levels: int
    height: int
    leaf_blocks: int = 1  # wide leaves: fcw masks are (8, n_blk, 16, 1)

    @property
    def sizes(self):
        nw0, d = self.nw0, self.d_levels
        return (128 * nw0, nw0, d * 128, d, d, 128 * self.leaf_blocks,
                11 * 8 * 3 * 16, 11 * 8 * 16)

    @property
    def total(self):
        return sum(self.sizes)


def pack_fast_payload(dk: DeviceFastKey2P) -> tuple[np.ndarray, FastPayloadLayout]:
    n_blk = dk.fcw_masks.shape[1] if dk.fcw_masks.ndim == 4 else 1
    layout = FastPayloadLayout(dk.plan.m_padded // 32, dk.plan.device_levels,
                               dk.height, n_blk)
    parts = [
        np.asarray(dk.seeds0, np.uint32).ravel(),
        np.asarray(dk.t0, np.uint32).ravel(),
        np.asarray(dk.cw_seed_masks, np.uint32).ravel(),
        np.asarray(dk.cw_tl, np.uint32).ravel(),
        np.asarray(dk.cw_tr, np.uint32).ravel(),
        np.asarray(dk.fcw_masks, np.uint32).ravel(),
        np.asarray(dk.rk_masks, np.uint32).ravel(),
        np.asarray(dk.rk_leaf, np.uint32).ravel(),
    ]
    payload = np.concatenate(parts)
    assert payload.shape[0] == layout.total
    return payload, layout


def unpack_fast_payload(payload, layout: FastPayloadLayout):
    nw0, d = layout.nw0, layout.d_levels
    offs = np.cumsum((0,) + layout.sizes)
    seg = [payload[offs[i]:offs[i + 1]] for i in range(len(layout.sizes))]
    fcw = (seg[5].reshape(8, 16, 1) if layout.leaf_blocks == 1
           else seg[5].reshape(8, layout.leaf_blocks, 16, 1))
    return (
        seg[0].reshape(8, 16, nw0),
        seg[1],
        seg[2].reshape(d, 8, 16, 1),
        seg[3],
        seg[4],
        fcw,
        seg[6].reshape(11, 8, 3, 16, 1),
        seg[7].reshape(11, 8, 16, 1),
    )


# --------------------------------------------------------------------------
# Batched point evaluation (keyword-based queries, db.go:119-135)
# --------------------------------------------------------------------------

def pack_point_bit_planes(points: np.ndarray, num_bits: int) -> np.ndarray:
    """Branch-bit planes for a batch of evaluation points.

    Returns (num_bits, NW) uint32 where level i's plane holds, packed, the
    bit ``get_bit(x, N - num_bits + i + 1, N)`` of each point — i.e. MSB
    first over the num_bits-bit domain (dpf/server.go:63-66).
    """
    n = len(points)
    nw = -(-n // 32)
    padded = np.zeros(nw * 32, dtype=np.uint64)
    padded[:n] = points.astype(np.uint64)
    levels = []
    for i in range(num_bits):
        shift = np.uint64(num_bits - 1 - i)
        bits = ((padded >> shift) & np.uint64(1)).astype(np.uint32)
        w = bits.reshape(-1, 32)
        levels.append((w << np.arange(32, dtype=np.uint32)).sum(axis=1, dtype=np.uint32))
    return np.stack(levels)


@dataclass
class DevicePointKey2P:
    num_bits: int
    num_points: int
    s_init_masks: jnp.ndarray  # (8, 16, 1) broadcast seed masks
    t_init_mask: jnp.ndarray  # scalar
    cw_seed_masks: jnp.ndarray  # (nb, 8, 16, 1)
    cw_tl: jnp.ndarray
    cw_tr: jnp.ndarray
    rk_masks: jnp.ndarray
    fcw_mask: jnp.ndarray


def make_device_point_key(server: dpf_host.Dpf, key: dpf_host.Key2P) -> DevicePointKey2P:
    s_bytes = np.frombuffer(key.s_init, dtype=np.uint8)
    bits = ((s_bytes[None, :] >> np.arange(8, dtype=np.uint8)[:, None]) & 1).astype(
        np.uint32
    )
    s_masks = (bits * _FULL)[:, :, None]
    cw_seed_masks, tl, tr = _cw_masks(key, 0)
    return DevicePointKey2P(
        num_bits=server.num_bits,
        num_points=0,
        s_init_masks=jnp.asarray(s_masks),
        t_init_mask=jnp.asarray(np.uint32(_FULL if key.t_init else 0)),
        cw_seed_masks=jnp.asarray(cw_seed_masks),
        cw_tl=jnp.asarray(tl),
        cw_tr=jnp.asarray(tr),
        rk_masks=jnp.asarray(prf_key_masks(server)),
        fcw_mask=jnp.asarray(np.uint32(_FULL if (key.final_cw & 1) else 0)),
    )


def point_eval_packed_core(s_masks, t_mask, cw_seed_masks, cw_tl, cw_tr,
                           rk_masks, fcw_mask, xbits, num_bits: int):
    """The 2-party point-eval walk over packed branch-bit planes.

    xbits (num_bits, NW) -> (NW,) packed selection-bit words (32 points
    per lane word; dpf/server.go:55-101 semantics incl. the inverted
    parity). Pure traced function — shared by the single-chip jit below
    and the mesh sharded step (parallel/mesh.py), which calls it on a
    shard-local slice of the planes."""
    nw = xbits.shape[1]
    seeds = jnp.broadcast_to(s_masks, (8, 16, nw)).astype(jnp.uint32)
    t_plane = jnp.broadcast_to(t_mask, (nw,)).astype(jnp.uint32)

    def body(i, carry):
        seeds, t_plane = carry
        out = _prf_triple(seeds, rk_masks)
        s_l, t_l, s_r, t_r = _children(
            out, t_plane, cw_seed_masks[i], cw_tl[i], cw_tr[i]
        )
        xb = xbits[i]
        seeds = (s_l & ~xb[None, None, :]) | (s_r & xb[None, None, :])
        t_plane = (t_l & ~xb) | (t_r & xb)
        return seeds, t_plane

    seeds, t_plane = jax.lax.fori_loop(0, num_bits, body, (seeds, t_plane))
    return _leaf_select_bits(seeds, t_plane, fcw_mask)


@functools.lru_cache(maxsize=32)
def _point_eval_fn(num_bits: int, nw: int, n_points: int):
    def run(s_masks, t_mask, cw_seed_masks, cw_tl, cw_tr, rk_masks, fcw_mask, xbits):
        packed = point_eval_packed_core(
            s_masks, t_mask, cw_seed_masks, cw_tl, cw_tr, rk_masks,
            fcw_mask, xbits, num_bits,
        )
        return _unpack_bits(packed, nw * 32)[:n_points]

    return jax.jit(run)


def eval_points_bits(dkey: DevicePointKey2P, xbit_planes: jnp.ndarray, n_points: int):
    """(n_points,) uint8 selection bits for arbitrary evaluation points."""
    nw = xbit_planes.shape[1]
    fn = _point_eval_fn(dkey.num_bits, nw, n_points)
    return fn(
        dkey.s_init_masks,
        dkey.t_init_mask,
        dkey.cw_seed_masks,
        dkey.cw_tl,
        dkey.cw_tr,
        dkey.rk_masks,
        dkey.fcw_mask,
        jnp.asarray(xbit_planes),
    )


@functools.lru_cache(maxsize=16)
def _point_eval_batch_fn(num_bits: int, nw: int, n_points: int):
    """vmap of the point-eval walk over a query batch."""
    single = _point_eval_fn(num_bits, nw, n_points)

    def fn(s_masks, t_masks, cw_s, cw_tl, cw_tr, rk, fcw, xbits):
        return jax.vmap(
            lambda sm, tm, cs, ctl, ctr, r, f: single(
                sm, tm, cs, ctl, ctr, r, f, xbits
            )
        )(s_masks, t_masks, cw_s, cw_tl, cw_tr, rk, fcw)

    return jax.jit(fn)


def eval_points_bits_batch(dkeys: list, xbit_planes, n_points: int):
    """(Q, n_points) uint8 selection bits; one dispatch for the batch.

    All keys must share num_bits (always 32 for keyword mode)."""
    nw = xbit_planes.shape[1]
    fn = _point_eval_batch_fn(dkeys[0].num_bits, nw, n_points)
    stack = lambda attr: jnp.stack([getattr(k, attr) for k in dkeys])
    return fn(
        stack("s_init_masks"),
        stack("t_init_mask"),
        stack("cw_seed_masks"),
        stack("cw_tl"),
        stack("cw_tr"),
        stack("rk_masks"),
        stack("fcw_mask"),
        jnp.asarray(xbit_planes),
    )


# --------------------------------------------------------------------------
# Multi-party (>= 3 server) full-domain expansion
# --------------------------------------------------------------------------
# Device evaluation of the sigma-slot PRG walk (dpf/server.go:110-144
# semantics as completed by host.generate_multi_server / host.eval_points_mp;
# the reference's own MP path is dead code — keygen panics). Layout: the
# gamma row-group axis is bit-packed into u32 lanes, the p2 seed slots are a
# small leading axis, and only the PARITY of each mu-word is computed —
# bit 0 of word delta is bit-plane 0 at byte 4*(delta%4) of output block
# delta//4, so each AES block yields 4 selection-bit planes directly.


@functools.lru_cache(maxsize=16)
def _mp_expand_fn(p2: int, nwg: int, num_blocks: int, gamma_bits: int,
                  delta_bits: int, height: int):
    n_gamma = 1 << gamma_bits

    def fn(seed_planes, present, rk_stack, ctr_masks, cw_par):
        # seed_planes (8, p2, 16, NWg); present (p2, 1, NWg);
        # rk_stack (num_blocks, 11, 8, 1, 16, 1);
        # ctr_masks (num_blocks, 8, 1, 16, 1); cw_par (num_blocks, p2, 4, 1)
        def body(carry, xs):
            rk, ctr, cwp = xs
            x = seed_planes ^ ctr
            out = aes_encrypt_planes(x, rk) ^ x  # MMO (dpf/common.go:60-75)
            # parity of little-endian u32 word 4b+k = bit0 of byte 4k
            par = out[0][:, np.array([0, 4, 8, 12]), :]  # (p2, 4, NWg)
            contrib = present & (par ^ cwp)
            y_b = contrib[0]
            for i in range(1, p2):  # p2 is small and static
                y_b = y_b ^ contrib[i]
            return carry, y_b  # (4, NWg)

        _, ys = jax.lax.scan(body, 0, (rk_stack, ctr_masks, cw_par))
        y = ys.reshape(num_blocks * 4, nwg)  # (mu_pad, NWg) parity planes
        # unpack: bits[x] for x = gamma * 2^delta_bits + delta
        gammas = jnp.arange(n_gamma, dtype=jnp.int32)
        rows = jnp.take(y.T, gammas >> 5, axis=0)  # (n_gamma, mu_pad)
        bits = (rows >> (gammas & 31)[:, None].astype(jnp.uint32)) & 1
        bits = bits[:, : 1 << delta_bits].reshape(-1)[:height]
        return bits.astype(jnp.uint8)

    return jax.jit(fn)


def expand_mp_full_domain_bits(server: dpf_host.Dpf, key: dpf_host.KeyMP,
                               height: int):
    """Device full-domain MP expansion -> (height,) uint8 bit shares.

    Bit-for-bit equal to ``(host.eval_points_mp(...) & 1) == 1`` over
    rows [0, height) (the XOR-share selection convention, server.py).
    Index domains only (row index = gamma*2^delta_bits + delta); keyword
    MP queries evaluate at arbitrary points and stay on the host path.
    """
    p2, mu, gamma_bits, delta_bits = dpf_host._mp_params(
        server.num_bits, key.num_parties
    )
    n_gamma = 1 << gamma_bits
    seeds = np.frombuffer(b"".join(key.sigma), dtype=np.uint8).reshape(
        n_gamma, p2, 16
    )
    # per-slot gamma-lane planes: (p2, 8, 16, NWg) -> (8, p2, 16, NWg)
    slot_planes = np.stack(
        [blocks_to_planes(np.ascontiguousarray(seeds[:, i])) for i in range(p2)]
    )
    seed_planes = np.ascontiguousarray(slot_planes.transpose(1, 0, 2, 3))
    nwg = seed_planes.shape[-1]

    # presence: zero seeds skip G and CW (dpf/server.go:127-136). Packed
    # per-lane 1-bits (the parity planes are bit-packed the same way, so
    # a plain & masks out absent slots).
    present_flags = seeds.any(axis=2)  # (n_gamma, p2)
    present = np.stack(
        [_pack_lane_mask(present_flags[:, i], nwg) for i in range(p2)]
    )[:, None, :]  # (p2, 1, NWg)

    num_blocks = -(-server.m * mu // 16)
    # round keys per output block: fixed key i%4 (prf_blocks extension)
    rk4 = _mp_fixed_rk4(server)
    rk_stack = np.stack([rk4[b % 4] for b in range(num_blocks)])[:, :, :, None]
    # -> (num_blocks, 11, 8, 1, 16, 1)

    # counter blocks: x ^= LE64(b//4) in bytes 0..7 (aes_host.prf_blocks)
    ctr = np.zeros((num_blocks, 16), dtype=np.uint8)
    for b in range(num_blocks):
        ctr[b, :8] = np.frombuffer((b // 4).to_bytes(8, "little"), np.uint8)
    ctr_bits = ((ctr[:, :, None] >> np.arange(8, dtype=np.uint8)) & 1)
    ctr_masks = (ctr_bits.transpose(0, 2, 1).astype(np.uint32) * _FULL
                 )[:, :, None, :, None]  # (num_blocks, 8, 1, 16, 1)

    # CW parity masks per (block, slot, word-in-block)
    mu_pad = num_blocks * 4
    cw_bits = np.zeros((p2, mu_pad), dtype=np.uint32)
    for i in range(p2):
        w = np.asarray(key.cw[i][:mu], dtype=np.uint32)
        cw_bits[i, : len(w)] = w & 1
    cw_par = (cw_bits * _FULL).reshape(p2, num_blocks, 4).transpose(1, 0, 2)
    cw_par = np.ascontiguousarray(cw_par)[..., None]  # (num_blocks, p2, 4, 1)

    fn = _mp_expand_fn(p2, nwg, num_blocks, gamma_bits, delta_bits, height)
    return fn(
        jnp.asarray(seed_planes), jnp.asarray(present), jnp.asarray(rk_stack),
        jnp.asarray(ctr_masks), jnp.asarray(cw_par),
    )


def _mp_fixed_rk4(server: "dpf_host.Dpf") -> list[np.ndarray]:
    """Bitsliced round-key masks of the four fixed MP PRG keys
    (prf_blocks: ciphers[b % 4]); each (11, 8, 16, 1)."""
    return [
        key_masks(key_schedule(server.ciphers[i].key)[None])[..., 0][..., None]
        for i in range(4)
    ]


def _pack_lane_mask(flags: np.ndarray, nw: int) -> np.ndarray:
    """(n,) bool -> (nw,) uint32 with bit j of word w = flags[32w+j]."""
    padded = np.zeros(nw * 32, dtype=bool)
    padded[: len(flags)] = flags
    return (
        padded.reshape(nw, 32).astype(np.uint32)
        << np.arange(32, dtype=np.uint32)
    ).sum(axis=1, dtype=np.uint32)


def mp_point_packed_core(xp, rk4, ksel, bytesel, present, cwm, p2: int):
    """The MP arbitrary-point eval over packed per-lane operands.

    xp (8, p2, 16, NW); rk4 (4, 11, 8, 1, 16, 1); ksel/bytesel (4, NW);
    present/cwm (p2, NW) -> (NW,) packed XOR-share parity bits. Per-lane
    round keys: the four fixed-key schedules, selected by the lane's
    one-hot ksel mask (disjoint, so OR composes them). Pure traced
    function — shared by the single-chip jit below and the mesh sharded
    step (parallel/mesh.py), which calls it on shard-local NW slices."""
    rk = rk4[0] & ksel[0]
    for k in range(1, 4):
        rk = rk | (rk4[k] & ksel[k])
    out = aes_encrypt_planes(xp, rk) ^ xp  # MMO (dpf/common.go:60-75)
    p0 = out[0]  # bit-0 planes, (p2, 16, NW)
    # parity of little-endian u32 word (delta & 3) = bit 0 of byte
    # 4*(delta & 3); per-lane word choice via one-hot byte masks
    par = (
        (p0[:, 0] & bytesel[0])
        ^ (p0[:, 4] & bytesel[1])
        ^ (p0[:, 8] & bytesel[2])
        ^ (p0[:, 12] & bytesel[3])
    )  # (p2, NW)
    contrib = present & (par ^ cwm)  # zero-seed slots skip G AND cw
    y = contrib[0]
    for i in range(1, p2):
        y = y ^ contrib[i]
    return y


@functools.lru_cache(maxsize=None)
def _mp_point_fn(p2: int, nw: int):
    def fn(xp, rk4, ksel, bytesel, present, cwm):
        return mp_point_packed_core(xp, rk4, ksel, bytesel, present, cwm, p2)

    return jax.jit(fn)


def eval_points_mp_bits(server: dpf_host.Dpf, key: dpf_host.KeyMP,
                        points) -> jnp.ndarray:
    """Device MP eval at arbitrary points -> (len(points),) uint8 bit shares.

    Bit-for-bit equal to ``(host.eval_points_mp(...) & 1) == 1`` (the MP
    XOR-share selection convention, server.py). Where the host path
    expands the full mu-word PRG stream per unique row gamma
    (dpf/server.go:131 semantics), each point here needs only the ONE
    16-byte PRG block containing output word delta: block b = delta // 4
    of the CTR-extended MMO PRG is AES_{k_{b%4}}(seed ^ LE64(b//4)) ^
    (seed ^ LE64(b//4)) (aes_host.prf_blocks), independent of all other
    blocks. One bitsliced AES per sigma slot per 32 rows, with per-lane
    round keys / output words selected by packed one-hot masks. This is
    the serving path for keyword-based multi-party queries
    (db.go:132-135 with >=3 servers), where the 2^32 domain rules out
    full-domain expansion.
    """
    xp, rk4, ksel, bytesel, present, cwm, p2 = mp_point_operands(
        server, key, points
    )
    n = len(np.asarray(points))
    fn = _mp_point_fn(p2, xp.shape[-1])
    y = fn(
        jnp.asarray(xp), jnp.asarray(rk4), jnp.asarray(ksel),
        jnp.asarray(bytesel), jnp.asarray(present), jnp.asarray(cwm),
    )
    return _unpack_bits(y, n)[:n]


def mp_point_operands(server: dpf_host.Dpf, key: dpf_host.KeyMP, points,
                      pad_to_words: int = 1):
    """Host-side packed operands for the MP arbitrary-point eval.

    Returns (xp, rk4, ksel, bytesel, present, cwm, p2) shaped as
    mp_point_packed_core expects, with the lane-word axis NW padded to a
    multiple of ``pad_to_words`` (the mesh step slices NW evenly across
    tp shards; padded lanes evaluate garbage points against zero table
    rows, contributing nothing to the XOR scan)."""
    p2, mu, gamma_bits, delta_bits = dpf_host._mp_params(
        server.num_bits, key.num_parties
    )
    pts = np.asarray(points, dtype=np.int64)
    n = len(pts)
    nw = -(-(-(-n // 32)) // pad_to_words) * pad_to_words
    if nw * 32 != n:
        pts = np.concatenate([pts, np.zeros(nw * 32 - n, dtype=np.int64)])
    deltas = pts & ((1 << delta_bits) - 1)
    gammas = (pts >> delta_bits) & ((1 << gamma_bits) - 1)
    b = deltas >> 2  # output block holding word delta
    kidx = b & 3  # fixed-key index (prf_blocks: ciphers[b % 4])
    ctr = b >> 2  # counter block value (prf_blocks: b // 4)
    widx = deltas & 3  # u32 word within the block

    sigma_arr = np.frombuffer(b"".join(key.sigma), dtype=np.uint8).reshape(
        1 << gamma_bits, p2, 16
    )
    seeds = sigma_arr[gammas]  # (n_pad, p2, 16)
    present_rows = seeds.any(axis=2)  # (n_pad, p2)
    x = seeds.copy()
    x[:, :, :8] ^= ctr.astype("<u8").view(np.uint8).reshape(-1, 8)[:, None, :]
    xp = np.stack(
        [blocks_to_planes(np.ascontiguousarray(x[:, i])) for i in range(p2)],
        axis=1,
    )  # (8, p2, 16, NW)

    rk4 = np.stack(_mp_fixed_rk4(server))[:, :, :, None]  # (4, 11, 8, 1, 16, 1)

    ksel = np.stack([_pack_lane_mask(kidx == k, nw) for k in range(4)])
    bytesel = np.stack([_pack_lane_mask(widx == k, nw) for k in range(4)])
    present = np.stack(
        [_pack_lane_mask(present_rows[:, i], nw) for i in range(p2)]
    )
    cwm = np.stack(
        [
            _pack_lane_mask(
                (np.asarray(key.cw[i], dtype=np.uint32)[deltas] & 1) == 1, nw
            )
            for i in range(p2)
        ]
    )
    return xp, rk4, ksel, bytesel, present, cwm, p2
