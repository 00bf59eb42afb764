"""Start-of-round self-check (run me FIRST, before building anything):

1. pyarrow-only testdata contract — catches driver schema drift in
   seconds with a readable message (round 3 lost all its artifacts to
   an unnoticed events.ts type change);
2. one oracle pass over a drift-sensitive query subset (timestamps,
   graph derivation, hashing) — catches semantic drift the schemas
   don't show.

Exit code 0 = safe to build.  ~30 s total, dominated by Spark startup.

Usage: python tools/selfcheck.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# the queries most sensitive to each drift class
PROBE_QUERIES = [
    "st_tumbling_agg",    # event-time types / timezone
    "tm_asof_enrich",     # temporal join over the same loader
    "g_twohop_enum",      # graph derivation + materialized cache
    "d_minhash_lsh",      # portable hashing + documents table
    "d_span_dedup",       # promoted primary r5: window hashing over documents
    "e_embedding_join",   # embeddings schema
]


def check_schemas() -> int:
    bad = 0
    for sf_dir in sorted(glob.glob("/root/testdata/sf*")):
        dir_bad = 0
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if not os.path.exists(p):
                print(f"FAIL {p}: missing")
                dir_bad += 1
                continue
            schema = pq.read_schema(p)
            if t == "events":
                import pyarrow as pa
                ts = schema.field("ts").type
                if not (pa.types.is_timestamp(ts) or ts == pa.int64()):
                    print(f"FAIL {p}: ts drifted to {ts} — teach "
                          "streaming/events.py:_with_event_time about it")
                    dir_bad += 1
        if dir_bad == 0:
            print(f"ok   {sf_dir}: {len(TABLES)} tables present")
        bad += dir_bad
    return bad


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    bad = check_schemas()
    if bad:
        print(f"\nSELFCHECK: {bad} schema problems — fix loaders BEFORE "
              "building features or running the bench")
        sys.exit(1)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         sf_dir, *PROBE_QUERIES, "--all"],
        cwd=REPO)
    if r.returncode != 0:
        print("\nSELFCHECK: oracle probes failed — semantic drift; "
              "diagnose before building")
        sys.exit(1)
    print("\nSELFCHECK: green — safe to build")


if __name__ == "__main__":
    main()
