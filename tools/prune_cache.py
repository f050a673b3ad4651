"""Prune .xla_cache to the entries the bench actually reads.

The repo ships pre-warmed persistent-XLA-cache entries because remote
compiles cost 1-10 min per shape (CLAUDE.md). Superseded warms from
earlier rounds accumulate; this tool keeps the working tree at the
budgeted size by deleting every entry NOT named in a usage trace.

Produce a trace by running the bench with the read/write tracer shim on
PYTHONPATH (a sitecustomize that chain-loads /root/.axon_site's and
wraps jax._src.compilation_cache.get/put_executable_and_time, appending
"HIT <key>" / "MISS <key>" / "PUT <key>" lines to $PIR_CACHE_TRACE):

    PIR_CACHE_TRACE=/tmp/keys_fast.txt python bench.py
    PIR_CACHE_TRACE=/tmp/keys_compat.txt BENCH_MODE=compat \
        BENCH_BATCH=1024 python bench.py

then prune to the union of the traces (moves pruned files to --backup
instead of deleting when given):

    python tools/prune_cache.py /tmp/keys_fast.txt /tmp/keys_compat.txt \
        --backup /tmp/xla_cache_pruned

Budget (CLAUDE.md): keep .xla_cache under ~300 MB at HEAD. Re-run the
bench afterwards and verify no new -cache file appears (a PUT line in a
fresh trace = a shape went cold).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".xla_cache")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("traces", nargs="+", help="trace files (HIT/PUT lines)")
    ap.add_argument("--backup", help="move pruned files here instead of "
                    "deleting")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    keep: set[str] = set()
    for path in args.traces:
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2 and parts[0] in ("HIT", "PUT"):
                    keep.add(parts[1] + "-cache")
    if not keep:
        print("no HIT/PUT keys found in traces; refusing to prune",
              file=sys.stderr)
        return 1

    kept = pruned = kept_bytes = pruned_bytes = 0
    for name in sorted(os.listdir(CACHE)):
        if not name.endswith("-cache"):
            continue
        path = os.path.join(CACHE, name)
        size = os.path.getsize(path)
        if name in keep:
            kept += 1
            kept_bytes += size
            continue
        pruned += 1
        pruned_bytes += size
        if args.dry_run:
            print(f"would prune {name} ({size/2**20:.1f} MB)")
        elif args.backup:
            os.makedirs(args.backup, exist_ok=True)
            shutil.move(path, os.path.join(args.backup, name))
        else:
            os.unlink(path)
    print(f"kept {kept} entries ({kept_bytes/2**20:.0f} MB), "
          f"pruned {pruned} ({pruned_bytes/2**20:.0f} MB)"
          + (" [dry run]" if args.dry_run else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
