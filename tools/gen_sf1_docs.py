#!/usr/bin/env python
"""Generate sf1 documents/embeddings fixtures for the corpus-pipeline scaling
line (the 3rd decade the read-only driver fixtures stop short of): a
deterministic 10x replication of sf0.1 along the axis a growing corpus
actually grows — MORE documents with the SAME per-replica duplication
structure.

The naive 10x copy would be wrong for dedup measurements: identical text
across replicas makes every document a 10-way exact duplicate, so candidate
PAIRS grow ~100x for 10x data and every alpha reads ~2 regardless of plan
shape. Instead replica k remaps the token space (every word suffixed with
the replica digit, k=0 kept verbatim), which translates the whole shingle
universe per replica: within-replica near-dup structure is preserved
exactly, cross-replica candidates are zero BY CONSTRUCTION, and pair volume
scales linearly like a real corpus whose new crawl does not duplicate the
old one. Embeddings rotate by k positions (norm-preserving circular shift),
so each replica's vector space has the sf0.1 neighborhood structure without
cross-replica near-identity. No RNG anywhere — byte-reproducible.

Writes <out_dir>/documents.parquet and <out_dir>/embeddings.parquet
(default /tmp/sf1 — a measurement input, not a repo artifact).

Usage: python tools/gen_sf1_docs.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

DOC_SRC = "/root/testdata/sf0.1/documents.parquet"
EMB_SRC = "/root/testdata/sf0.1/embeddings.parquet"
REPLICAS = 10
DOC_STRIDE = 5_000  # sf0.1's doc-id space size
VEC_STRIDE = 2_000  # sf0.1's vec-id space size
DIM = 64


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    docs_out = os.path.join(out_dir, "documents.parquet")
    con.sql(
        f"""
COPY (
  SELECT
    doc_id + {DOC_STRIDE}*k.k AS doc_id,
    CASE WHEN k.k = 0 THEN text
         ELSE list_aggregate(
                list_transform(string_split(text, ' '),
                               w -> CASE WHEN w = '' THEN w
                                         ELSE w || CAST(k.k AS VARCHAR) END),
                'string_agg', ' ')
    END AS text,
    lang, source || '_r' || CAST(k.k AS VARCHAR) AS source, n_chars
  FROM '{DOC_SRC}', (SELECT unnest(range({REPLICAS})) AS k) k
  ORDER BY doc_id
) TO '{docs_out}' (FORMAT PARQUET)
"""
    )
    emb_out = os.path.join(out_dir, "embeddings.parquet")
    con.sql(
        f"""
COPY (
  SELECT
    vec_id + {VEC_STRIDE}*k.k AS vec_id,
    CASE WHEN k.k = 0 THEN embedding
         ELSE list_transform(range(1, {DIM} + 1),
                             i -> embedding[((i - 1 + k.k) % {DIM}) + 1])
    END AS embedding,
    label
  FROM '{EMB_SRC}', (SELECT unnest(range({REPLICAS})) AS k) k
  ORDER BY vec_id
) TO '{emb_out}' (FORMAT PARQUET)
"""
    )
    print(con.sql(f"SELECT count(*), max(doc_id) FROM '{docs_out}'").fetchall())
    print(con.sql(f"SELECT count(*), max(vec_id) FROM '{emb_out}'").fetchall())


if __name__ == "__main__":
    main()
