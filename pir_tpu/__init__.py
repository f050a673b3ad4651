"""pir_tpu — a TPU-native private information retrieval framework.

Feature-parity rebuild of the mvmcconnell/pir reference library
(single-server and multi-server PIR), re-architected for TPU:

* 2-server secret-shared PIR: DPF (BGI'16) with a bitsliced AES-128 PRG
  evaluated full-domain on the TPU VPU, fused with a masked-XOR scan.
* Keyword PIR: sqrt search tree + DPF over the 32-bit keyword space.
* Single-server cPIR: nested Paillier (Damgård–Jurik), recursive
  (doubly-encrypted) queries — CPython / native C++ / TPU batched
  Montgomery engines, bit-identical answers.
* ASPIR (authenticated PIR), both secret-shared and AHE variants.
* Engines: host numpy golden, native C++/AES-NI, TPU (single chip and
  mesh-sharded via shard_map), plus a TCP service shell.
"""

from .database import (
    Database,
    DBMetadata,
    generate_empty_db,
    generate_random_db,
    get_optimal_db_dimensions,
    get_optimal_weighted_db_dimensions,
    new_database,
)
from .query import (
    QueryShare,
    SecretSharedQueryResult,
    new_index_query_shares,
    new_index_query_shares_batch,
    new_keyword_query_shares,
    new_keyword_query_shares_batch,
    recover,
)
from .slot import (
    Slot,
    get_required_slot_size,
    new_empty_slot,
    new_random_slot,
    new_slot,
    new_slot_from_string,
    xor_slots,
)

__version__ = "0.1.0"

__all__ = [
    "Database",
    "DBMetadata",
    "QueryShare",
    "SecretSharedQueryResult",
    "Slot",
    "generate_empty_db",
    "generate_random_db",
    "get_optimal_db_dimensions",
    "get_optimal_weighted_db_dimensions",
    "get_required_slot_size",
    "new_database",
    "new_empty_slot",
    "new_index_query_shares",
    "new_index_query_shares_batch",
    "new_keyword_query_shares",
    "new_keyword_query_shares_batch",
    "new_random_slot",
    "new_slot",
    "new_slot_from_string",
    "recover",
    "xor_slots",
]
