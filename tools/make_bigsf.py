#!/usr/bin/env python3
"""Build an 8x-replicated validation dataset for the t2 comparator.

The scale-sensitive tables (documents, embeddings, events) are replicated
`FACTOR` times with the ScaleProbe constructions (fresh ids; replica-
suffixed tokens so no trigram crosses replicas; replica-rotated embeddings
so no vector duplicates across replicas); the TPC-H star tables are copied
unchanged. Running tools/check_correctness.py against the output dir then
re-validates every oracle at ~8x the usual gate scale — the point is the
scale-sensitive items (LSH recall, sketch tolerances, float parity), which
small-sf passes can't stress.

pyarrow (not duckdb) writes events/documents: the events ts column is
copied with its source physical type intact (ns in older fixture
generations, us in newer ones — Sources.readEvents handles both); duckdb
would silently rewrite ns as micros, hiding the ns read path from tests.

Usage: python3 tools/make_bigsf.py [src_sf_dir] [out_dir] [factor]
"""
import shutil, sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_big")
FACTOR = int(sys.argv[3] if len(sys.argv) > 3 else 8)
ID_STEP = 10_000_000

OUT.mkdir(parents=True, exist_ok=True)

# star tables: unchanged copies (the TPC-H queries re-validate, at 1x)
for t in "region nation customer supplier part orders lineitem".split():
    shutil.copy(SRC / f"{t}.parquet", OUT / f"{t}.parquet")
    print(f"copied   {t}")

# documents: fresh ids + replica-suffixed tokens (replica-disjoint shingles)
doc = pq.read_table(SRC / "documents.parquet")
waves = []
for rep in range(FACTOR):
    waves.append(pa.table({
        "doc_id": pc.add(doc["doc_id"], rep * ID_STEP),
        "text": pc.replace_substring_regex(doc["text"], r"(\S+)", rf"\1_{rep}"),
        "lang": doc["lang"],
        "source": doc["source"],
        "n_chars": doc["n_chars"],
    }))
pq.write_table(pa.concat_tables(waves), OUT / "documents.parquet")
print(f"replicated documents x{FACTOR}: {doc.num_rows * FACTOR} rows")

# events: fresh event ids, everything else identical (denser activity per
# user stresses sessionize/funnel/trailing windows; oracle recomputes).
# pyarrow copies ts with the source fixture's physical type intact.
ev = pq.read_table(SRC / "events.parquet")
waves = []
for rep in range(FACTOR):
    waves.append(pa.table({
        "event_id": pc.add(ev["event_id"], rep * 1_000_000_000),
        "ts": ev["ts"],
        "user_id": ev["user_id"],
        "event_type": ev["event_type"],
        "value": ev["value"],
        "props": ev["props"],
    }))
pq.write_table(pa.concat_tables(waves), OUT / "events.parquet")
print(f"replicated events x{FACTOR}: {ev.num_rows * FACTOR} rows")

# embeddings: fresh ids + rotate-by-replica (norm-preserving, replica-
# distinct — the ScaleProbe construction); duckdb list ops keep FLOAT[]
con = duckdb.connect()
dim = con.execute(
    f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1"
).fetchone()[0]
assert FACTOR < dim, f"factor {FACTOR} must stay below embedding dim {dim}"
con.execute(f"""
  COPY (
    SELECT e.vec_id + r.rep * {ID_STEP} AS vec_id,
           (embedding[(r.rep + 1):] || embedding[:r.rep])::FLOAT[] AS embedding,
           e.label
    FROM read_parquet('{SRC}/embeddings.parquet') e,
         (SELECT unnest(range({FACTOR})) AS rep) r
  ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/embeddings.parquet')").fetchone()[0]
print(f"replicated embeddings x{FACTOR}: {n} rows")
print(f"wrote {OUT}")
