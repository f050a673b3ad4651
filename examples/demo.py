"""End-to-end demo: two non-colluding PIR services + a client.

Runs everything in one process (the reference's test strategy) on CPU;
swap PirService(use_tpu=True) on a TPU host. Usage: python examples/demo.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from pir_tpu import generate_random_db, new_index_query_shares, recover
from pir_tpu.aspir_shared import (
    check_audit,
    generate_audit_for_shared_query,
    new_authenticated_index_query_shares,
)
from pir_tpu.keyword import new_private_sqrt_st, pad_to_sqrt
from pir_tpu.service import PirClient, PirService


def main():
    # --- plain 2-server index PIR over TCP ---
    db = generate_random_db(1 << 12, 32)
    s0 = PirService(db).start()
    s1 = PirService(db).start()
    client = PirClient([s0.address, s1.address])
    idx = 1234
    res = client.query_index(idx)
    assert bytes(res[0].data) == db.data[idx].tobytes()
    print(f"index PIR: privately fetched row {idx} "
          f"({db.db_size} rows x {db.slot_bytes} B) OK")
    client.close(); s0.close(); s1.close()

    # --- keyword PIR via sqrt search tree (local roles) ---
    data = sorted(pad_to_sqrt([f"user-{i:05d}" for i in range(900)]), reverse=True)
    sqst = new_private_sqrt_st()
    sqst.build_for_data(data)
    key = "user-00417"
    row = sqst.find_bucket(key)
    shares = new_index_query_shares(
        sqst.get_second_layer_metadata(), row, sqst.height, 2, fast=True)
    recovered = recover([sqst.private_query(s) for s in shares])
    col = sqst.find_in_row(recovered, key)
    found = data[row * sqst.width + col]
    assert found == key
    print(f"keyword PIR: found {key!r} privately (bucket {row}, col {col}) OK")

    # --- authenticated (ASPIR) shared query with audit ---
    keydb = generate_random_db(1 << 10, 8)
    target = 77
    ashares = new_authenticated_index_query_shares(
        keydb.metadata(), target, keydb.slot(target), 1, 2, fast=True)
    audits = [generate_audit_for_shared_query(keydb, s) for s in ashares]
    assert check_audit(*audits)
    print("ASPIR: audit passed for the legitimate auth key OK")

    print("demo complete")


if __name__ == "__main__":
    main()
