#!/usr/bin/env python
"""Generate an sf1 lineitem fixture for the GRAPH-family scaling line (the
third decade the read-only driver fixtures stop short of, for the queries
that build the part co-purchase graph: pagerank_copurchase,
graph_label_propagation, graph_kcore, graph_triangle_clustering,
event_cooccurrence_lift, assoc_rules_copurchase).

A deterministic 10x replication of sf0.1 along the axis a growing
marketplace actually grows — MORE orders over MORE products with the SAME
basket structure. Replica k shifts BOTH l_orderkey and l_partkey by their
sf0.1 space sizes, so the co-purchase graph becomes 10 vertex-disjoint
copies of the sf0.1 graph: edges, triangles, communities, and cores all
scale exactly 10x while per-basket (and hence per-node-degree) structure is
bit-identical per replica. That makes measured sf0.1 -> sf1 exponents read
pure plan scaling — shuffle, scan, and aggregation growth — with zero
confound from density drift (a naive copy without the partkey shift would
multiply basket overlap instead, superlinearly inflating the pair volume
the way no real assortment grows). No RNG anywhere — byte-reproducible.

Only the columns the graph queries read are materialized (l_orderkey,
l_partkey, plus l_suppkey/l_quantity kept for the co-occurrence lift and
basket-weight variants); the full TPC-H width is not needed for this
measurement input. Writes <out_dir>/lineitem.parquet (default /tmp/sf1 —
a measurement input, not a repo artifact; re-run to regenerate anywhere).

Usage: python tools/gen_sf1_lineitem.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1/lineitem.parquet"
REPLICAS = 10
ORDER_STRIDE = 150_000  # sf0.1's l_orderkey space size
PART_STRIDE = 20_000    # sf0.1's l_partkey space size


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "lineitem.parquet")
    duckdb.sql(
        f"""
COPY (
  SELECT
    l_orderkey + {ORDER_STRIDE} * k.k AS l_orderkey,
    l_partkey + {PART_STRIDE} * k.k AS l_partkey,
    l_suppkey,
    l_quantity
  FROM read_parquet('{SRC}'), (SELECT unnest(range({REPLICAS})) AS k) k
  ORDER BY l_orderkey
) TO '{out}' (FORMAT PARQUET)
"""
    )
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"wrote {out}: {n} rows ({REPLICAS}x replicas, disjoint key spaces)")


if __name__ == "__main__":
    main()
