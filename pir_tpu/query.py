"""Client-side query construction and answer recovery (reference: query.go).

Secret-shared (DPF) queries live here; Paillier-encrypted queries are in
``encrypted.py`` (they share the DBMetadata grid conventions).
"""

from __future__ import annotations

from dataclasses import dataclass

from .database import DBMetadata
from .dpf import host as dpf
from .slot import Slot, new_empty_slot, xor_slots
from .utils.bits import num_bits_for_height


@dataclass
class QueryShare:
    """One server's share of a DPF query (query.go:12-22).

    ``key_fast`` carries the framework-native early-termination DPF key
    (dpf/host.py fast mode); exactly one of key_two_party / key_fast /
    key_multi_party is set.
    """

    key_two_party: dpf.Key2P | None
    key_multi_party: dpf.KeyMP | None
    prf_keys: list[dpf.PrfKey]
    is_keyword_based: bool
    is_two_party: bool
    share_number: int
    group_size: int
    key_fast: dpf.FastKey2P | None = None


@dataclass
class SecretSharedQueryResult:
    """Shares of the resulting slots (db.go:28-32)."""

    slot_bytes: int
    shares: list[Slot]


def _new_query_shares(
    dbmd: DBMetadata, key: int, group_size: int, num_shares: int, is_index_query: bool
) -> list[QueryShare]:
    """query.go:52-101 (including its panics, surfaced as ValueError)."""
    dim_height = dbmd.db_size // group_size
    if dim_height == 0:
        raise ValueError("database height is set to zero; something is wrong")

    num_bits = num_bits_for_height(dim_height) if is_index_query else 32

    pf = dpf.client_initialize(num_bits)

    keys_2p = None
    keys_mp = None
    if num_shares == 2:
        keys_2p = dpf.generate_two_server(pf, key, 1)
    else:
        keys_mp = dpf.generate_multi_server(pf, key, 1, num_shares)

    if is_index_query and key >= dim_height:
        raise ValueError("requesting key outside of domain")

    shares = []
    for i in range(num_shares):
        shares.append(
            QueryShare(
                key_two_party=keys_2p[i] if keys_2p else None,
                key_multi_party=keys_mp[i] if keys_mp else None,
                prf_keys=pf.prf_keys,
                is_keyword_based=not is_index_query,
                is_two_party=num_shares == 2,
                share_number=i,
                group_size=group_size,
            )
        )
    return shares


def new_index_query_shares(
    dbmd: DBMetadata, index: int, group_size: int, num_shares: int,
    fast: bool = False, leaf_bits: int | None = None,
) -> list[QueryShare]:
    """query.go:42-44. fast=True uses the early-termination DPF (native
    mode, ~32x cheaper server expansion; not wire-compatible with the
    reference's per-row varint leaves, but recovers identical answers).
    leaf_bits widens the fast leaves (dpf.host wide-leaf note: tree AES
    shrinks geometrically; defaults to dpf.host.DEFAULT_FAST_LEAF_BITS,
    clamped per height)."""
    if fast:
        return new_fast_index_query_shares(dbmd, index, group_size,
                                           num_shares, leaf_bits=leaf_bits)
    return _new_query_shares(dbmd, index, group_size, num_shares, True)


def new_fast_index_query_shares(
    dbmd: DBMetadata, index: int, group_size: int, num_shares: int,
    leaf_bits: int | None = None,
) -> list[QueryShare]:
    if num_shares != 2:
        raise NotImplementedError("fast mode is two-party")
    dim_height = dbmd.db_size // group_size
    if dim_height == 0:
        raise ValueError("database height is set to zero; something is wrong")
    lb = dpf.fast_leaf_bits_for_height(
        dim_height, leaf_bits or dpf.DEFAULT_FAST_LEAF_BITS
    )
    pf = dpf.client_initialize(dpf.fast_depth_for_height(dim_height, lb))
    keys = dpf.generate_two_server_fast(pf, index, dim_height, leaf_bits=lb)
    return [
        QueryShare(
            key_two_party=None,
            key_multi_party=None,
            prf_keys=pf.prf_keys,
            is_keyword_based=False,
            is_two_party=True,
            share_number=i,
            group_size=group_size,
            key_fast=keys[i],
        )
        for i in range(num_shares)
    ]


def new_fast_index_query_shares_batch(
    dbmd: DBMetadata, indices: list[int], group_size: int,
    num_shares: int = 2, leaf_bits: int | None = None,
) -> list[list[QueryShare]]:
    """Batched fast-mode share construction: one vectorised keygen walk
    for the whole batch (dpf.host.generate_two_server_fast_batch). All
    queries share one set of (public) PRF keys; seeds stay per-query.
    Returns one [share_0, share_1] pair per index."""
    if num_shares != 2:
        raise NotImplementedError("fast mode is two-party")
    dim_height = dbmd.db_size // group_size
    if dim_height == 0:
        raise ValueError("database height is set to zero; something is wrong")
    lb = dpf.fast_leaf_bits_for_height(
        dim_height, leaf_bits or dpf.DEFAULT_FAST_LEAF_BITS
    )
    pf = dpf.client_initialize(dpf.fast_depth_for_height(dim_height, lb))
    key_pairs = dpf.generate_two_server_fast_batch(pf, indices, dim_height,
                                                   leaf_bits=lb)
    return [
        [
            QueryShare(
                key_two_party=None,
                key_multi_party=None,
                prf_keys=pf.prf_keys,
                is_keyword_based=False,
                is_two_party=True,
                share_number=i,
                group_size=group_size,
                key_fast=pair[i],
            )
            for i in range(num_shares)
        ]
        for pair in key_pairs
    ]


def _new_query_shares_batch(
    dbmd: DBMetadata, keys: list[int], group_size: int, num_shares: int,
    is_index_query: bool,
) -> list[list[QueryShare]]:
    """Vectorised reference-semantics share construction (one tree walk
    for the batch; dpf.host.generate_two_server_batch). Two-party only."""
    if num_shares != 2:
        return [
            _new_query_shares(dbmd, k, group_size, num_shares, is_index_query)
            for k in keys
        ]
    dim_height = dbmd.db_size // group_size
    if dim_height == 0:
        raise ValueError("database height is set to zero; something is wrong")
    num_bits = num_bits_for_height(dim_height) if is_index_query else 32
    if is_index_query and any(k >= dim_height for k in keys):
        raise ValueError("requesting key outside of domain")
    pf = dpf.client_initialize(num_bits)
    pairs = dpf.generate_two_server_batch(pf, list(keys), 1)
    return [
        [
            QueryShare(
                key_two_party=pair[i],
                key_multi_party=None,
                prf_keys=pf.prf_keys,
                is_keyword_based=not is_index_query,
                is_two_party=True,
                share_number=i,
                group_size=group_size,
            )
            for i in range(2)
        ]
        for pair in pairs
    ]


def new_index_query_shares_batch(
    dbmd: DBMetadata, indices: list[int], group_size: int,
    num_shares: int = 2, fast: bool = False, leaf_bits: int | None = None,
) -> list[list[QueryShare]]:
    """Batched share construction; one [share per server] list per index."""
    if fast:
        return new_fast_index_query_shares_batch(
            dbmd, indices, group_size, num_shares, leaf_bits=leaf_bits
        )
    return _new_query_shares_batch(dbmd, indices, group_size, num_shares, True)


def new_keyword_query_shares_batch(
    dbmd: DBMetadata, keywords: list[int], group_size: int,
    num_shares: int = 2,
) -> list[list[QueryShare]]:
    """Batched keyword-DPF share construction (32-bit domain)."""
    return _new_query_shares_batch(dbmd, keywords, group_size, num_shares,
                                   False)


def new_keyword_query_shares(
    dbmd: DBMetadata, keyword: int, group_size: int, num_shares: int
) -> list[QueryShare]:
    """query.go:47-49. Note: keyword queries skip the domain check."""
    return _new_query_shares(dbmd, keyword, group_size, num_shares, False)


def recover(res_shares: list[SecretSharedQueryResult]) -> list[Slot]:
    """XOR all servers' share vectors per column (query.go:277-297)."""
    num_slots = len(res_shares[0].shares)
    out = [new_empty_slot(res_shares[0].slot_bytes) for _ in range(num_slots)]
    for share in res_shares:
        for j in range(num_slots):
            xor_slots(out[j], share.shares[j])
    return out
