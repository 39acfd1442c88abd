"""Feature-prep semantics beyond the oracle gate: the hashing trick against
a pure-Python md5 reference, and equal-frequency binning's defining
properties (partition of the rows, data-value edges, balanced buckets)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from kinesis_demo_spark.queries import features as FE

SF = "/root/testdata/sf0.001"


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_feature_hashing_matches_python_reference(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    con.close()
    expect: dict[tuple[int, int], int] = defaultdict(int)
    counts: dict[tuple[int, int], int] = defaultdict(int)
    for doc_id, text in docs:
        for tok in text.split(" "):
            if tok == "":
                continue
            h = _h60_py(tok)
            b = h % FE.FEATURE_HASH_DIM
            expect[(doc_id, b)] += 1 if (h // FE.FEATURE_HASH_DIM) % 2 == 0 else -1
            counts[(doc_id, b)] += 1
    expect = {k: v for k, v in expect.items() if v != 0}
    got = {
        (r.doc_id, r.bucket): (r.weight, r.n_tokens)
        for r in FE.feature_hash_vectorize(spark, SF).collect()
    }
    assert {k: v[0] for k, v in got.items()} == expect
    for k, (_, n) in got.items():
        assert n == counts[k]


def test_feature_hashing_signs_cancel_somewhere(spark):
    # the signed variant only differs from plain counting if signs mix;
    # assert at least one bucket has weight < its token count
    rows = FE.feature_hash_vectorize(spark, SF).collect()
    assert any(abs(r.weight) < r.n_tokens for r in rows)


def test_quantile_binning_partitions_and_balances(spark):
    rows = FE.feature_quantile_binning(spark, SF).collect()
    con = duckdb.connect()
    totals = dict(
        con.execute(
            f"SELECT event_type, count(*) FROM '{SF}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    values = defaultdict(set)
    for et, v in con.execute(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
    ).fetchall():
        values[et].add(v)
    con.close()

    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    assert set(by_type) == set(totals)
    for et, rs in by_type.items():
        # bins partition the rows exactly
        assert sum(r.n_rows for r in rs) == totals[et]
        assert sorted(r.bin for r in rs) == list(range(len(rs)))
        # edges are actual data values (quantile_disc semantics)
        for r in rs:
            for e in (r.edge_q25, r.edge_q50, r.edge_q75):
                assert e in values[et]
        # equal-frequency within the slack discrete ties allow: every bin
        # holds at most ceil(n/4) + ties; assert no bin exceeds half the rows
        n = totals[et]
        assert max(r.n_rows for r in rs) <= n // 2 + 1
        # bin ranges are ordered and non-overlapping
        rs.sort(key=lambda r: r.bin)
        for a, b in zip(rs, rs[1:]):
            assert a.hi <= b.lo
