"""Round out the expansion frontier: tail=5, all-XLA, stream at tail=4,
plus diagnostics (pure XLA AES rate, transpose, tile costs)."""
import sys, time
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import jax
from pir_tpu.config import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from pir_tpu import query as q
from pir_tpu.database import Database
from pir_tpu.server import TpuPirServer
from pir_tpu.dpf.bitslice import aes_encrypt_planes
from pir_tpu.dpf.device import make_fast_payload_batch
from pir_tpu.models.pipeline import (
    fused_fast_root_batch_pallas_fn, fused_fast_overlap_step_fn,
)

height, slot, batch = 1 << 20, 1024, 4096
rng = np.random.default_rng(0)
db = Database(slot_bytes=slot, db_size=height)
db.data = rng.integers(0, 256, size=(height, slot), dtype=np.uint8)
server = TpuPirServer(db, use_pallas=True)
idxs = [int(i) for i in rng.integers(0, height, size=batch)]
shares = [s[0] for s in
          q.new_index_query_shares_batch(db.metadata(), idxs, 1, 2, fast=True)]
pay, layout = make_fast_payload_batch(shares)
depth = layout.depth
table = server._root_table_u8(1, depth)
pay_dev = jnp.asarray(pay)
np.asarray(table[0, :1])  # relay warm


def timeit(fn, *a, label="", reps=3):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    c = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    log(f"{label}: best {best*1e3:.1f} ms (compile+first {c:.1f}s)")
    return best


null_fn = jax.jit(lambda t: t[:8, :8] + jnp.uint8(1))
t_null = timeit(null_fn, table, reps=5, label="null")

ref_fn = fused_fast_root_batch_pallas_fn(layout, tail_levels=4)
t4 = timeit(ref_fn, table, pay_dev, label="full tail=4 (ref)")
ref = np.asarray(ref_fn(table, pay_dev)[:4])

fn5 = fused_fast_root_batch_pallas_fn(layout, tail_levels=5)
timeit(fn5, table, pay_dev, label="full tail=5")
assert np.array_equal(ref, np.asarray(fn5(table, pay_dev)[:4]))
log("tail=5 bit-exact")

fnx = fused_fast_root_batch_pallas_fn(layout, all_xla_expand=True)
timeit(fnx, table, pay_dev, label="full all_xla_expand")
assert np.array_equal(ref, np.asarray(fnx(table, pay_dev)[:4]))
log("all_xla_expand bit-exact")

# overlap stream step at tail=4 (VMEM check + speed)
step = fused_fast_overlap_step_fn(layout, tail_levels=4)
words0 = jnp.zeros((table.shape[0] // 32, batch), jnp.uint32)
try:
    out_prev, words1 = step(table, words0, pay_dev)
    jax.block_until_ready(words1)
    t0 = time.perf_counter()
    out2, words2 = step(table, words1, pay_dev)
    jax.block_until_ready((out2, words2))
    log(f"overlap step tail=4: {(time.perf_counter()-t0)*1e3:.1f} ms "
        f"(compiles + runs OK)")
    assert np.array_equal(ref, np.asarray(out2[:4]))
    log("overlap tail=4 bit-exact")
except Exception as e:  # VMEM OOM would show here
    log(f"overlap step tail=4 FAILED: {type(e).__name__}: {str(e)[:300]}")

# ---- diagnostics on the lanes pathology at large W ----
Q = batch
x0 = jnp.asarray(rng.integers(0, 1 << 32, size=(8, 3, 16, 32 * Q),
                              dtype=np.uint32))
rkm = jnp.asarray(rng.integers(0, 2, size=(11, 8, 3, 16, 1), dtype=np.uint32)
                  * np.uint32(0xFFFFFFFF))
REPS = 8


def chain(x, rk):
    for _ in range(REPS):
        x = aes_encrypt_planes(x, rk) ^ x
    return x


blocks = REPS * 3 * 32 * Q * 32
t = timeit(jax.jit(chain), x0, rkm, label=f"XLA AES chain x{REPS} @ W*Q={32*Q}")
log(f"  -> {blocks/max(t-t_null,1e-9)/1e9:.2f} G blocks/s (roof 1.27)")

s0 = jnp.asarray(rng.integers(0, 1 << 32, size=(8, 16, 64 * Q),
                              dtype=np.uint32))
tr = jax.jit(lambda s: s.reshape(8, 16, 64, Q).transpose(3, 0, 1, 2))
timeit(tr, s0, label="transpose (8,16,64*Q)->(Q,8,16,64)")
log(f"null={t_null*1e3:.1f} ms")
