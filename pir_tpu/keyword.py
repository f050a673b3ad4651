"""Keyword PIR via a sqrt search tree (reference: keyword.go).

``PrivateSqrtST``: first layer = sqrt(N) boundary keys held in the clear
(client scans locally), second layer = the full sorted data as an index-
PIR database queried with group_size = height (one whole sqrt(N) row per
query). Requires perfect-square, reverse-sorted input (keyword.go:37-50).

The alternative keyword mechanism — DPF over the 32-bit keyword space —
lives in the query/server layers (query.new_keyword_query_shares,
db.set_keywords; db.go:119-135).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .database import Database, DBMetadata, new_database
from .slot import Slot, get_required_slot_size, new_slot_from_string

PADDING = "\x00"  # keyword.go:9


@dataclass
class PrivateSqrtST:
    first_layer: list[str] = field(default_factory=list)
    second_layer: Database | None = None
    num_keys: int = 0
    slot_bytes: int = 0
    width: int = 0
    height: int = 0

    def build_for_data(self, data: list[str]) -> None:
        """keyword.go:34-73. Raises ValueError on bad input (Go errors)."""
        n = len(data)
        if math.isqrt(n) ** 2 != n:
            raise ValueError("length of data is not a perfect square")
        for i in range(n - 1):
            if data[i] < data[i + 1]:
                raise ValueError("data not sorted")

        sqrt_dim = math.isqrt(n)
        boundaries = [data[i] for i in range(sqrt_dim, n, sqrt_dim)]
        boundaries.append(data[n - 1])

        db = new_database()
        db.build_for_data_with_slot_size(data, get_required_slot_size(data))

        self.first_layer = boundaries
        self.second_layer = db
        self.slot_bytes = get_required_slot_size(boundaries)
        self.num_keys = n
        self.width = sqrt_dim
        self.height = sqrt_dim

    def get_second_layer_metadata(self) -> DBMetadata:
        return self.second_layer.metadata()

    def private_query(self, query, server=None):
        """PIR over the second layer (keyword.go:76-81).

        `server` may be a TpuPirServer bound to self.second_layer; defaults
        to the host engine.
        """
        if server is not None:
            return server.private_secret_shared_query(query)
        from . import server as srv

        return srv.private_secret_shared_query(self.second_layer, query)

    def private_encrypted_query(self, query):
        """cPIR over the second layer (keyword.go:84-90)."""
        from .encrypted import private_encrypted_query

        return private_encrypted_query(self.second_layer, query)

    # ---- client-side lookup flow (demonstrated in keyword_test.go:58-95) ----

    def find_bucket(self, key: str) -> int:
        """First-layer scan: index of the bucket that may hold `key`."""
        row_index = 0
        for row_index, boundary in enumerate(self.first_layer):
            if key > boundary:
                break
        return row_index

    def find_in_row(self, row: list[Slot], key: str) -> int:
        """Scan a recovered row for the key; returns the column index."""
        query_slot = new_slot_from_string(key, self.slot_bytes)
        col = 0
        for col, slot in enumerate(row):
            if slot.compare(query_slot) <= 0:
                break
        return col


def new_private_sqrt_st() -> PrivateSqrtST:
    return PrivateSqrtST()


@dataclass
class PrivateBST:
    """Keyword PIR via a level-order binary search tree.

    The reference names this as future work with better asymptotic
    bandwidth than the sqrt tree (keyword.go:14-16): instead of shipping
    sqrt(N) boundary keys in the clear, the client walks log2(N) levels,
    issuing ONE single-slot PIR query per level against that level's
    (tiny) boundary database, then a final data query. Total bandwidth
    O(slot * log N) vs O(sqrt N * slot).

    Privacy: each level's query is an independent PIR query (index within
    the level is never revealed); the access *pattern* (one query per
    level) is fixed and data-independent.

    Requires power-of-two, descending-sorted input (pad_to_power_of_2 +
    reverse sort, mirroring the sqrt tree's conventions).
    """

    levels: list[Database] = field(default_factory=list)  # level l: 2^l keys
    data_layer: Database | None = None
    num_keys: int = 0
    depth: int = 0

    def build_for_data(self, data: list[str]) -> None:
        n = len(data)
        if n & (n - 1):
            raise ValueError("length of data is not a power of two")
        for i in range(n - 1):
            if data[i] < data[i + 1]:
                raise ValueError("data not sorted")
        self.num_keys = n
        self.depth = n.bit_length() - 1
        slot = get_required_slot_size(data)
        self.levels = []
        for lvl in range(self.depth):
            step = n >> (lvl + 1)
            # boundary key of node j at level lvl: data[(2j+1) * step]
            keys = [data[(2 * j + 1) * step] for j in range(1 << lvl)]
            db = new_database()
            db.build_for_data_with_slot_size(keys, slot)
            self.levels.append(db)
        self.data_layer = new_database()
        self.data_layer.build_for_data_with_slot_size(data, slot)

    def private_level_query(self, level: int, query):
        """Server side: answer one level's boundary-key PIR query.

        Level databases are tiny (2^level single-slot rows), so the host
        engine answers them; the data layer is served as an ordinary
        index-PIR database (the service shell's main db)."""
        from . import server as srv

        return srv.private_secret_shared_query(self.levels[level], query)

    def lookup(self, key: str, query_level, query_data) -> tuple[int, list]:
        """Walk the tree with caller-provided PIR oracles.

        query_level(lvl, index) -> Slot at that node (via PIR);
        query_data(index) -> recovered data slots. Returns (index, slots).
        Descending order: go left (0-bit) when key > boundary.
        """
        node = 0
        slot_bytes = self.data_layer.slot_bytes
        probe = new_slot_from_string(key, slot_bytes)
        for lvl in range(self.depth):
            boundary = query_level(lvl, node)
            bit = 0 if boundary.compare(probe) < 0 else 1
            node = 2 * node + bit
        return node, query_data(node)


def new_private_bst() -> PrivateBST:
    return PrivateBST()


def pad_to_power_of_2(data: list[str]) -> list[str]:
    """keyword.go:100-114."""
    next_power = int(math.pow(2, math.ceil(math.log2(len(data)))))
    return [data[i] if i < len(data) else PADDING for i in range(next_power)]


def pad_to_sqrt(data: list[str]) -> list[str]:
    """keyword.go:116-131."""
    next_sqrt = int(math.ceil(math.sqrt(len(data))))
    next_sqrt *= next_sqrt
    return [data[i] if i < len(data) else PADDING for i in range(next_sqrt)]
