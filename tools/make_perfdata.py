"""Build a 10x perf-only dataset from sf0.1 (NOT for correctness gates).

Usage: python tools/make_perfdata.py [outdir]   (default /root/perfdata/sfx1.0)
Used by the round-6 second pass (OPTIMIZATION_r06.md) as the measurement
scale when the driver-generated sf1.0 directory is unavailable.

Replicates each table 10x with shifted keys; text/embeddings perturbed
per replica so dedup/ANN workloads keep realistic selectivity instead of
becoming 10-way exact-duplicate blowups.  Matches the driver's sf1.0 row
counts (50k docs / 20k embeddings / 1M events / 6M lineitem).
"""
import os, sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/perfdata/sfx1.0"
R = 10
os.makedirs(DST, exist_ok=True)

def write(name, tbl):
    pq.write_table(tbl, f"{DST}/{name}.parquet", compression="snappy")
    print(name, tbl.num_rows)

# small dims: copy as-is
for t in ("region", "nation", "supplier", "customer", "part", "orders", "lineitem"):
    tb = pq.read_table(f"{SRC}/{t}.parquet")
    if t in ("region", "nation"):
        write(t, tb); continue
    # replicate with shifted keys so joins keep matching
    cols = {c: tb.column(c).to_numpy(zero_copy_only=False) for c in tb.column_names}
    outs = []
    keymap = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    }[t]
    maxes = {k: int(cols[k].max()) + 1 for k in keymap}
    for r in range(R):
        d = {}
        for c, v in cols.items():
            if c in keymap:
                d[c] = v + r * maxes[c]
            else:
                d[c] = v
        outs.append(pa.table({c: pa.array(d[c]) if not isinstance(d[c], np.ndarray) else pa.array(d[c]) for c in tb.column_names}))
    write(t, pa.concat_tables(outs).cast(tb.schema))

# documents: shift doc_id, perturb text by appending a replica-salt token
tb = pq.read_table(f"{SRC}/documents.parquet")
doc_id = tb.column("doc_id").to_numpy()
text = tb.column("text").to_pylist()
lang = tb.column("lang")
source = tb.column("source")
n_chars = tb.column("n_chars")
mx = int(doc_id.max()) + 1
outs = []
for r in range(R):
    if r == 0:
        tx = text
    else:
        tx = [s + f" perfsalt{r}x{i%13}" for i, s in enumerate(text)]
    outs.append(pa.table({
        "doc_id": pa.array(doc_id + r * mx),
        "text": pa.array(tx, pa.string()),
        "lang": lang, "source": source, "n_chars": n_chars,
    }))
write("documents", pa.concat_tables(outs).cast(tb.schema))

# embeddings: shift vec_id, small deterministic perturbation per replica
tb = pq.read_table(f"{SRC}/embeddings.parquet")
vec_id = tb.column("vec_id").to_numpy()
emb = np.array(tb.column("embedding").to_pylist(), dtype=np.float32)
label = tb.column("label")
mx = int(vec_id.max()) + 1
rng = np.random.RandomState(7)
outs = []
for r in range(R):
    e = emb if r == 0 else emb + rng.normal(0, 0.05, emb.shape).astype(np.float32)
    outs.append(pa.table({
        "vec_id": pa.array(vec_id + r * mx),
        "embedding": pa.array(list(e), pa.list_(pa.float32())),
        "label": label,
    }))
write("embeddings", pa.concat_tables(outs).cast(tb.schema))

# events: shift event_id/user_id, keep ts & props
tb = pq.read_table(f"{SRC}/events.parquet")
eid = tb.column("event_id").to_numpy()
uid = tb.column("user_id").to_numpy()
mxe, mxu = int(eid.max()) + 1, int(uid.max()) + 1
outs = []
for r in range(R):
    outs.append(pa.table({
        "event_id": pa.array(eid + r * mxe),
        "ts": tb.column("ts"),
        "user_id": pa.array(uid + r * mxu),
        "event_type": tb.column("event_type"),
        "value": tb.column("value"),
        "props": tb.column("props"),
    }))
write("events", pa.concat_tables(outs).cast(tb.schema))
print("done ->", DST)
