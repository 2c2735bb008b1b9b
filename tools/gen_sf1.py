#!/usr/bin/env python3
"""Generate a local sf1 fixture (10x sf0.1) for scaling-slope runs.

Driver-side tooling (duckdb), NOT part of the library. /root/testdata
is read-only and the driver's generator isn't available, so sf1 is
derived from sf0.1 by 10x replication with key shifts chosen so each
flagship query's WORKLOAD scales ~10x rather than degenerating:

- documents: doc_id += k*10_000 per replica k (contiguous ids keep the
  modulo-based dup-synthesis ratios; the shift stays far below the
  +1_000_000 ids the dedup queries synthesize). Replica k>=1 rewrites
  every token t -> t_k: within-replica similarity structure is
  preserved exactly, while cross-replica near-dups are impossible —
  naive replication would make 90% of the corpus exact duplicates and
  near-dup candidate counts superlinear, which measures a different
  workload, not a bigger one. n_chars is recomputed from the new text.
- orders/lineitem: order keys += k*1_000_000 (join stays consistent),
  l_suppkey += k*10_000 so the q124 trade graph gains 10x supplier
  nodes and ~10x edges; o_custkey is NOT shifted so the query's
  o_custkey < 500 customer hub-set keeps selecting every replica's
  orders.
- embeddings: vec_id += k*10_000 per replica k; replica k>=1 applies a
  fixed ORTHOGONAL transform (coordinate rotation by 7k positions +
  deterministic sign flips). Orthogonality preserves every norm and
  within-replica inner product exactly UP TO FLOAT SUMMATION ORDER
  (the permuted coordinates make downstream dot/norm reductions sum
  in a different order, so raw doubles can differ from replica 0 by
  ulps; the round-6 statistics every query emits are identical), so
  cluster/near-dup structure scales 10x, while cross-replica cosines
  are scrambled — naive
  replication would hand the ANN tier 10 exact copies of every vector
  and measure dedup of the fixture, not search at scale. Labels are
  kept, so per-label populations (q186's groups, q185's negatives)
  also grow 10x. Sign flips are exact in IEEE, so replica geometry is
  bit-faithful.
- all other tables: copied verbatim (unused by the flagship tier).

Usage: python3 tools/gen_sf1.py [outdir] [replicas]
       (defaults /tmp/graft_sf1, 10; replicas=100 builds the sf10
       two-decade fixture — key shifts stay collision-free up to
       replicas=100: max doc_id 5e3 + 99*1e4 < the +1e6 synthesis
       band, max o_orderkey 6e5 + 99*1e6 distinct per replica, and
       no two replicas share an (orthogonal-rotation, sign) pair
       below k=192)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
assert 1 <= REPLICAS <= 100, "key shifts verified collision-free to 100"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def write(name: str, sql: str) -> None:
    con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


docs = []
for k in range(REPLICAS):
    text = (
        "text"
        if k == 0
        else "array_to_string(list_transform(string_split(text, ' '),"
        f" t -> t || '_{k}'), ' ')"
    )
    docs.append(
        f"SELECT doc_id + {k * 10_000} AS doc_id, {text} AS text, lang,"
        f" source, CAST(length({text}) AS BIGINT) AS n_chars"
        f" FROM '{SRC}/documents.parquet'"
    )
write("documents", " UNION ALL ".join(docs))

orders = [
    f"SELECT o_orderkey + {k * 1_000_000} AS o_orderkey, o_custkey,"
    f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
    f" FROM '{SRC}/orders.parquet'"
    for k in range(REPLICAS)
]
write("orders", " UNION ALL ".join(orders))

lineitem = [
    f"SELECT l_orderkey + {k * 1_000_000} AS l_orderkey, l_partkey,"
    f" l_suppkey + {k * 10_000} AS l_suppkey, l_linenumber, l_quantity,"
    f" l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
    f" l_shipdate"
    f" FROM '{SRC}/lineitem.parquet'"
    for k in range(REPLICAS)
]
write("lineitem", " UNION ALL ".join(lineitem))

emb = []
for k in range(REPLICAS):
    if k == 0:
        vec = "embedding"
    else:
        # orthogonal per-replica transform: rotate coordinates by 7k
        # and flip signs on a k-dependent pattern — exact in IEEE
        vec = (
            "CAST(list_transform(range(1, 65), i ->"
            f" embedding[1 + ((i - 1 + {7 * k}) % 64)]"
            f" * (CASE WHEN (i + {k}) % 3 = 0 THEN -1 ELSE 1 END))"
            " AS FLOAT[])"
        )
    emb.append(
        f"SELECT vec_id + {k * 10_000} AS vec_id, {vec} AS embedding,"
        f" label FROM '{SRC}/embeddings.parquet'"
    )
write("embeddings", " UNION ALL ".join(emb))

for t in ["region", "nation", "customer", "supplier", "part", "events"]:
    write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")
