"""Bounds for the sketch-based aggregates the oracle can't hash-check."""

from __future__ import annotations

from kinesis_demo_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_approx_percentile_error_bounded(spark):
    rows = all_queries()["approx_percentiles_value"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # accuracy=10000 -> rank error <= n/10000; at fixture n the sketch
        # should land within 1% of the exact median's magnitude
        assert abs(r.approx_median - r.exact_median) <= max(0.01 * abs(r.exact_median), 0.5)


def test_approx_distinct_error_bounded(spark):
    row = all_queries()["approx_distinct_parts"](spark, SF).collect()[0]
    assert abs(row.approx_parts - row.exact_parts) <= 0.05 * row.exact_parts


def test_cms_estimate_is_an_upper_bound_on_exact_counts(spark):
    from kinesis_demo_spark.queries.analytics import heavy_hitters_cms
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    df = heavy_hitters_cms(spark, SF_SMOKE)
    assert df.filter(F.col("cms_est") < F.col("exact_cnt")).count() == 0  # collisions only inflate
    assert df.count() > 0


def test_hourly_gapfill_grid_is_dense_and_zero_filled(spark):
    import datetime

    rows = all_queries()["timeseries_hourly_gapfill"](spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    total_events = 0
    saw_empty_hour = False
    for user, urows in by_user.items():
        urows.sort(key=lambda r: r.hour)
        # dense: consecutive grid rows are exactly one hour apart, no holes
        for a, b in zip(urows, urows[1:]):
            assert b.hour - a.hour == datetime.timedelta(hours=1), (user, a.hour, b.hour)
        saw_empty_hour |= any(r.n_events == 0 and r.sum_value == 0.0 for r in urows)
        total_events += sum(r.n_events for r in urows)
    # zero-filled gap rows exist (sparse fixture), and no event is lost
    assert saw_empty_hour
    from kinesis_demo_spark.io import load_table

    assert total_events == load_table(spark, SF, "events").count()


def test_zorder_tiles_are_64x64_aligned(spark):
    from kinesis_demo_spark.queries.analytics import zorder_heatmap_locality

    rows = zorder_heatmap_locality(spark, SF).collect()
    assert rows
    for r in rows:
        # a morton-DIV-4096 tile covers one ALIGNED 64x64 cell block — the
        # locality guarantee a Z-ordered layout gives range queries
        assert r["max_x"] - r["min_x"] < 64 and r["max_y"] - r["min_y"] < 64
        assert r["min_x"] // 64 == r["max_x"] // 64
        assert r["min_y"] // 64 == r["max_y"] // 64
        # codes inside a tile stay inside the tile's 4096-code range
        assert r["min_morton"] // 4096 == r["ztile"] == r["max_morton"] // 4096


def test_funnel_stage_ordering_semantics(spark, tmp_path_factory):
    """A click BEFORE the first view must not advance the funnel; one after
    must. Constructed per-user event sequences pin the order sensitivity."""
    import datetime as dt

    from kinesis_demo_spark.queries.analytics import funnel_user_stages

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: click BEFORE view, never after -> stage 1 only
    rows += [(1, t0, 1, "click", 0.0, "{}"), (2, t0 + dt.timedelta(minutes=1), 1, "view", 0.0, "{}")]
    # user 2: view -> click -> purchase in order -> stage 3
    rows += [
        (3, t0, 2, "view", 0.0, "{}"),
        (4, t0 + dt.timedelta(minutes=1), 2, "click", 0.0, "{}"),
        (5, t0 + dt.timedelta(minutes=2), 2, "purchase", 0.0, "{}"),
    ]
    # user 3: purchase before click -> stage 2 (view, click) only
    rows += [
        (6, t0, 3, "view", 0.0, "{}"),
        (7, t0 + dt.timedelta(minutes=1), 3, "purchase", 0.0, "{}"),
        (8, t0 + dt.timedelta(minutes=2), 3, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    d = str(tmp_path_factory.mktemp("funnel"))
    df.write.parquet(d + "/events.parquet")
    stages = {r.user_id: r.stage_reached for r in funnel_user_stages(spark, d).collect()}
    assert stages == {1: 1, 2: 3, 3: 2}


def test_cohort_retention_offsets_and_conservation(spark):
    """Offset 0 contains every user exactly once (each user is active in
    their own first week), offsets are non-negative, and no offset row can
    exceed its cohort's size."""
    from kinesis_demo_spark.queries.analytics import cohort_weekly_retention

    rows = cohort_weekly_retention(spark, "/root/testdata/sf0.001").collect()
    assert all(r.week_offset >= 0 for r in rows)
    week0 = {r.cohort_week: r.n_active for r in rows if r.week_offset == 0}
    total_users = sum(week0.values())
    import duckdb

    n = duckdb.sql(
        "select count(distinct user_id) from '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()[0]
    assert total_users == n
    for r in rows:
        assert r.n_active <= week0[r.cohort_week]


def test_transition_matrix_probabilities_sum_to_one(spark):
    from kinesis_demo_spark.queries.analytics import event_transition_matrix

    rows = event_transition_matrix(spark, "/root/testdata/sf0.001").collect()
    assert rows
    from collections import defaultdict

    by_cur = defaultdict(float)
    for r in rows:
        assert r.p > 0
        by_cur[r.cur] += r.p
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-9, (cur, total)


def test_cooccurrence_lift_identities(spark):
    """support * n_users == n_ab, confidence == support/P(a), and lift is
    symmetric in (a, b) — recomputed from an independent DuckDB basket."""
    import duckdb

    from kinesis_demo_spark.queries.analytics import event_cooccurrence_lift

    rows = event_cooccurrence_lift(spark, "/root/testdata/sf0.001").collect()
    assert rows
    con = duckdb.connect()
    n, = con.execute(
        "select count(distinct user_id) from '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()
    per = dict(
        con.execute(
            "select event_type, count(distinct user_id) from "
            "'/root/testdata/sf0.001/events.parquet' group by 1"
        ).fetchall()
    )
    con.close()
    for r in rows:
        assert r.support == r.n_ab / n
        assert r.confidence_a_to_b == r.n_ab / per[r.type_a]
        # lift symmetry: n_ab/(n_a*n_b/n) is the same either direction
        lift_ba = (r.n_ab / per[r.type_b]) / (per[r.type_a] / n)
        assert abs(r.lift - lift_ba) < 1e-12


def test_scd2_intervals_partition_the_timeline(spark):
    """Per user: versions are 1..n dense, intervals chain exactly
    (valid_to == next valid_from), only the last interval is open, states
    alternate between consecutive versions, and n_events sums to the
    user's event count."""
    from collections import defaultdict

    from kinesis_demo_spark.queries.analytics import scd2_user_state_intervals
    from kinesis_demo_spark.io import load_table

    sf = "/root/testdata/sf0.001"
    rows = scd2_user_state_intervals(spark, sf).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    total = 0
    for user, urows in by_user.items():
        urows.sort(key=lambda r: r.version)
        assert [r.version for r in urows] == list(range(1, len(urows) + 1))
        for a, b in zip(urows, urows[1:]):
            assert a.valid_to == b.valid_from, (user, a.version)
            assert a.state != b.state, (user, a.version)  # runs were collapsed
        assert urows[-1].valid_to is None  # current state is open-ended
        total += sum(r.n_events for r in urows)
    assert total == load_table(spark, sf, "events").count()


def test_bloom_prefilter_matches_plain_semi_join(spark):
    """No false negatives ever: the bloom-prefiltered exact count equals the
    plain semi join's, and bloom candidates are a superset of true matches."""
    import duckdb

    from kinesis_demo_spark.queries.runtime_filter import (
        ACCTBAL_MIN,
        bloom_prefilter_semi_join,
    )

    sf = "/root/testdata/sf0.001"
    r = bloom_prefilter_semi_join(spark, sf).collect()[0]
    truth, = duckdb.sql(
        f"select count(*) from '{sf}/orders.parquet' o where o.o_custkey in "
        f"(select c_custkey from '{sf}/customer.parquet' where c_acctbal > {ACCTBAL_MIN})"
    ).fetchone()
    assert r.n_exact == truth
    assert r.n_bloom_pass >= r.n_exact
    assert r.n_false_positives == r.n_bloom_pass - r.n_exact


def test_time_operators_self_heal_non_utc_sessions(spark):
    """A caller (e.g. the driver harness) may hand the engine a session
    whose default timezone drifted. Every time-sensitive r5 operator must
    still match the naive-UTC oracle because load_table re-pins the session
    timezone (io.ensure_runtime_confs) — window boundaries, week buckets
    and interval bounds silently shift otherwise."""
    from kinesis_demo_spark.registry import all_oracle_sql, all_queries

    from .oracle_harness import compare, duckdb_conn

    sf = "/root/testdata/sf0.001"
    Q, O = all_queries(), all_oracle_sql()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        con = duckdb_conn(sf)
        for name in (
            "hopping_window_counts",
            "cohort_weekly_retention",
            "scd2_user_state_intervals",
            "funnel_user_stages",
        ):
            assert not compare(Q[name](spark, sf), con, O[name], name), name
        con.close()
        # and the engine left the session healed, not just its own queries
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


# --- point-in-time feature join ---------------------------------------------


def test_pit_join_excludes_equal_timestamp_events(spark, tmp_path_factory):
    """The leakage pin: an event at EXACTLY the label row's timestamp must
    not contribute to its features (it would not have been visible at
    serving time), while strictly earlier events must."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kinesis_demo_spark.queries.relational import (
        CUSTKEY_MOD,
        pit_feature_join_orders,
    )

    out = tmp_path_factory.mktemp("pit")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    before = t0 - dt.timedelta(seconds=5)
    user = 3
    events = [
        (1, before, user, "click", 10.0, "{}"),   # strictly before -> counts
        (2, t0, user, "click", 100.0, "{}"),      # equal ts -> must NOT count
    ]
    spark.createDataFrame(
        events,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    ).write.parquet(str(out / "events.parquet"))
    # o_custkey chosen so o_custkey % CUSTKEY_MOD == user
    orders = [(7, user + CUSTKEY_MOD, "O", 1.0, t0, "1-URGENT")]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(out / "orders.parquet"))
    row = pit_feature_join_orders(spark, str(out)).collect()[0]
    assert row.n_prior_events == 1
    assert row.prior_value_sum == 10.0


# --- PageRank ---------------------------------------------------------------


def _numpy_pagerank(edges, iters, d=0.85):
    import numpy as np

    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for a, b in edges:
        w[idx[b], idx[a]] += 1.0
    outw = w.sum(axis=0)
    p = w / outw
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - d) / n + d * (p @ r)
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_on_tiny_graph(spark, tmp_path_factory):
    from kinesis_demo_spark.io import release_persisted
    from kinesis_demo_spark.queries.analytics import (
        PAGERANK_ITERS,
        pagerank_copurchase,
    )

    out = tmp_path_factory.mktemp("pr")
    # orders: (1,2 together) x2, (2,3 together) x1 -> asymmetric weights
    rows = [
        (10, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None),
        (10, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", None),
        (11, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None),
        (11, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", None),
        (12, 2, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None),
        (12, 3, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", None),
    ]
    import datetime as dt

    rows = [r[:10] + (dt.datetime(2024, 1, 1),) for r in rows]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(out / "lineitem.parquet"))
    got = {r.part: r.pagerank for r in pagerank_copurchase(spark, str(out)).collect()}
    release_persisted()
    # co-purchase edges with multiplicity: (1,2)x2 both ways, (2,3)x1 both ways
    want = _numpy_pagerank([(1, 2), (1, 2), (2, 1), (2, 1), (2, 3), (3, 2)], PAGERANK_ITERS)
    assert set(got) == set(want)
    # scale-9 fixed point quantizes each op at 0.5e-9; five iterations over
    # this 3-node graph accumulate well under 1e-6 vs float numpy
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])
    # rank mass conservation on a dangling-free graph (up to quantization)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_is_deterministic_across_runs(spark):
    from kinesis_demo_spark.io import release_persisted
    from kinesis_demo_spark.queries.analytics import pagerank_copurchase

    sf = "/root/testdata/sf0.001"
    r1 = {r.part: r.pagerank for r in pagerank_copurchase(spark, sf).collect()}
    release_persisted()
    r2 = {r.part: r.pagerank for r in pagerank_copurchase(spark, sf).collect()}
    release_persisted()
    assert r1 == r2  # byte-identical, the integer fixed-point guarantee


def test_temporal_join_equal_timestamp_interval_boundary(spark, tmp_path_factory):
    """When consecutive state intervals share valid_from (boundary events at
    the identical timestamp), a probe at that instant must see the LATER
    version — the containment rule (valid_from <= t < valid_to) makes the
    earlier interval zero-length at the boundary."""
    import datetime as dt

    from kinesis_demo_spark.queries.analytics import temporal_join_orders_state
    from kinesis_demo_spark.queries.relational import CUSTKEY_MOD

    out = tmp_path_factory.mktemp("tjtie")
    user = 5
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 13, 0, 0)
    events = [
        (1, t0, user, "view", 1.0, "{}"),      # version 1: view @ t0
        (2, t1, user, "click", 1.0, "{}"),     # version 2: click @ t1
        (3, t1, user, "purchase", 1.0, "{}"),  # version 3: purchase @ t1 (tie!)
    ]
    spark.createDataFrame(
        events,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    ).write.parquet(str(out / "events.parquet"))
    orders = [(100, user + CUSTKEY_MOD, "O", 1.0, t1, "1-URGENT")]  # probe AT the tie
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(out / "orders.parquet"))
    row = temporal_join_orders_state(spark, str(out)).collect()[0]
    assert row.state_at_order == "purchase" and row.state_version == 3


def test_triangle_counts_match_brute_force_and_conserve(spark):
    """Per-node triangle counts from the degree-ordered enumeration must
    equal a brute-force adjacency-set count, and sum to exactly 3x the
    number of distinct triangles."""
    from kinesis_demo_spark.queries.analytics import graph_triangle_clustering

    sf = "/root/testdata/sf0.001"
    li = {
        (r.l_orderkey, r.l_partkey)
        for r in spark.read.parquet(f"{sf}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    }
    baskets: dict[int, set[int]] = {}
    for k, p in li:
        baskets.setdefault(k, set()).add(p)
    adj: dict[int, set[int]] = {}
    for parts in baskets.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    expect_tri: dict[int, int] = {}
    total = 0
    for u, nb in adj.items():
        for v in nb:
            if v <= u:
                continue
            common = nb & adj[v]
            for w in common:
                if w > v:  # each triangle once at its id-ordered corners
                    total += 1
                    for n in (u, v, w):
                        expect_tri[n] = expect_tri.get(n, 0) + 1
    rows = graph_triangle_clustering(spark, sf).collect()
    got = {r.part: r.triangles for r in rows}
    degs = {r.part: r.degree for r in rows}
    assert set(got) == set(adj)
    for n in adj:
        assert got[n] == expect_tri.get(n, 0), n
        assert degs[n] == len(adj[n]), n
    assert sum(got.values()) == 3 * total
    assert total > 0, "fixture graph has no triangles — test is vacuous"


def test_autocorr_matches_numpy_reference(spark):
    import numpy as np
    import duckdb
    from datetime import timedelta

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, date_trunc('hour', ts) AS hour,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    con.close()
    by_user = {}
    for uid, hour, cents in rows:
        by_user.setdefault(uid, {})[hour] = cents

    from kinesis_demo_spark.queries.analytics import ts_autocorr_components

    got = {r.user_id: r for r in ts_autocorr_components(spark, SF).collect()}

    def ref_r(x, k):
        m = x.mean()
        den = ((x - m) ** 2).sum()
        if den == 0:
            return None
        return float(((x[k:] - m) * (x[:-k] - m)).sum() / den)

    checked = 0
    for uid, series in by_user.items():
        h0, h1 = min(series), max(series)
        nh = int((h1 - h0).total_seconds() // 3600) + 1
        if nh < 3:
            assert uid not in got
            continue
        x = np.array(
            [series.get(h0 + timedelta(hours=i), 0) for i in range(nh)], dtype=np.float64
        )
        r = got[uid]
        assert r.n_hours == nh
        assert r.s_cents == int(x.sum())
        for k, rv in ((1, r.r1), (2, r.r2)):
            expect = ref_r(x, k)
            if expect is None:
                assert rv is None
            else:
                assert abs(rv - expect) < 1e-9
                checked += 1
    assert checked > 0


def _copurchase_edges(sf_dir):
    """Reference weighted co-purchase edge dict {(src, dst): w} via DuckDB."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH li AS (SELECT l_orderkey, l_partkey
                    FROM read_parquet('{sf_dir}/lineitem.parquet'))
        SELECT a.l_partkey, b.l_partkey, count(*)
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    con.close()
    return {(s, d): w for s, d, w in rows}


def test_kcore_fixpoint_matches_python_peel(spark):
    """fixpoint=True must return the TRUE k-core: peel in plain Python to
    convergence and compare survivor sets + degrees exactly. Also certifies
    the fixture converges well inside GRAPH_MAX_FIXPOINT_ROUNDS (the
    operator raises otherwise)."""
    from kinesis_demo_spark.queries.analytics import graph_kcore

    edges = _copurchase_edges(SF)
    nodes = {s for s, _ in edges}
    # ceil(0.7 x mean degree) — must mirror graph_kcore's r11 threshold
    k = (7 * len(edges) + 10 * len(nodes) - 1) // (10 * len(nodes))
    alive = set(nodes)
    deg: dict = {}
    while True:
        deg = {}
        for (s, d), _w in edges.items():
            if s in alive and d in alive:
                deg[s] = deg.get(s, 0) + 1
        new_alive = {n for n, dg in deg.items() if dg >= k}
        if new_alive == alive:
            break
        alive = new_alive
    got = {r.part: (r.core_degree, r.k_threshold)
           for r in graph_kcore(spark, SF, fixpoint=True).collect()}
    assert set(got) == alive
    for n in alive:
        assert got[n] == (deg[n], k)


def test_lpa_fixpoint_matches_python_propagation(spark):
    """fixpoint=True weighted synchronous LPA vs a plain-Python reference
    run to convergence: identical label assignment (ties to smaller label,
    exactly the struct-min rule)."""
    from kinesis_demo_spark.queries.analytics import (
        GRAPH_MAX_FIXPOINT_ROUNDS,
        graph_label_propagation,
    )

    edges = _copurchase_edges(SF)
    labels = {n: n for n in {s for s, _ in edges}}
    for rnd in range(GRAPH_MAX_FIXPOINT_ROUNDS):
        votes: dict = {}
        for (s, d), w in edges.items():
            key = (d, labels[s])
            votes[key] = votes.get(key, 0) + w
        new = {}
        for (d, lab), wv in votes.items():
            cur = new.get(d)
            if cur is None or (-wv, lab) < cur:
                new[d] = (-wv, lab)
        new_labels = {d: lab for d, (_nw, lab) in new.items()}
        if new_labels == labels:
            break
        labels = new_labels
    else:
        raise AssertionError("python LPA reference did not converge")
    got = {r.part: (r.community, r.community_size)
           for r in graph_label_propagation(spark, SF, fixpoint=True).collect()}
    sizes: dict = {}
    for lab in labels.values():
        sizes[lab] = sizes.get(lab, 0) + 1
    assert {p: c for p, (c, _s) in got.items()} == labels
    for p, (c, s) in got.items():
        assert s == sizes[c]
    # On this small dense fixture the TRUE fixpoint collapses to one
    # epidemic label (classic synchronous-LPA behavior on dense graphs) —
    # the fixed-round registered variant stops early precisely to keep
    # community structure. The differential above is the real check; this
    # only pins that the collapse is total, so a future fixture change
    # that breaks the expectation is noticed.
    assert len(sizes) == 1 and len(labels) > 1


def test_gapfill_runs_expand_to_dense_grid(spark):
    """Cross-plan equivalence (the rolling_active_users_intervals pattern):
    exploding every run of timeseries_gapfill_runs must reproduce
    timeseries_hourly_gapfill's dense grid EXACTLY — same rows, same
    zero-fill, same sums."""
    from pyspark.sql import functions as F

    from kinesis_demo_spark.queries.analytics import (
        timeseries_gapfill_runs,
        timeseries_hourly_gapfill,
    )

    sf = "/root/testdata/sf0.001"
    runs = timeseries_gapfill_runs(spark, sf)
    expanded = runs.select(
        "user_id",
        F.explode(F.expr("sequence(hour_start, hour_end, interval 1 hour)")).alias("hour"),
        "n_events",
        "sum_value",
    )
    dense = timeseries_hourly_gapfill(spark, sf)
    key = lambda r: (r["user_id"], r["hour"])  # noqa: E731
    exp = {key(r): (r["n_events"], r["sum_value"]) for r in expanded.collect()}
    den = {key(r): (r["n_events"], r["sum_value"]) for r in dense.collect()}
    assert exp == den


def test_linkpred_on_planted_graph(spark, tmp_path):
    """graph_linkpred_common_neighbors vs a plain-Python reference on a
    planted co-purchase graph: a {1,2,3} triangle, 2-4 and 3-4 bridges, and
    a 4-5 pendant. Known answers: e.g. query node 1 is non-adjacent only to
    4 (witnesses 2 AND 3 -> cn=2, jaccard 2/(2+3-2)) and to 5 (no common
    neighbor -> no row); 5's sole candidate set comes through witness 4."""
    from kinesis_demo_spark.queries.analytics import (
        LINKPRED_TOPK,
        graph_linkpred_common_neighbors,
    )

    orders = [(1, 1), (1, 2), (1, 3), (2, 2), (2, 4), (3, 3), (3, 4), (4, 4), (4, 5)]
    df = spark.createDataFrame(orders, "l_orderkey bigint, l_partkey bigint")
    df.write.parquet(str(tmp_path / "lineitem.parquet"))

    # python reference
    import collections

    adj = collections.defaultdict(set)
    baskets = collections.defaultdict(set)
    for k, p in orders:
        baskets[k].add(p)
    for ps in baskets.values():
        for a in ps:
            for b in ps:
                if a != b:
                    adj[a].add(b)
    expected = {}
    for q in sorted(adj)[:10]:
        cands = []
        for y in sorted(adj):
            if y == q or y in adj[q]:
                continue
            cn = len(adj[q] & adj[y])
            if cn:
                jac = cn / (len(adj[q]) + len(adj[y]) - cn)
                cands.append((-cn, y, cn, jac))
        for rnk, (_, y, cn, jac) in enumerate(sorted(cands)[:LINKPRED_TOPK], 1):
            expected[(q, y)] = (cn, jac, rnk)

    got = {
        (r.query_part, r.candidate_part): (r.common_neighbors, r.jaccard, r.rnk)
        for r in graph_linkpred_common_neighbors(spark, str(tmp_path)).collect()
    }
    assert got == expected
    assert got[(1, 4)] == (2, 2 / 3, 1)  # the hand-derived anchor row


def test_seasonal_naive_eval_known_answer(spark, tmp_path):
    """timeseries_seasonal_naive_eval on a planted series: user 1 has hourly
    sums 10 (h0), 12 (h0+24h), 7 (h0+25h), 12 (h0+48h) -> two evaluable
    hours (|12-10|=2 and |12-12|=0), MAE 1.0, one exact hit; the h0+25h
    hour has no t-24h counterpart and must be excluded."""
    import datetime as dt

    from kinesis_demo_spark.queries.analytics import timeseries_seasonal_naive_eval

    h0 = dt.datetime(2024, 3, 1, 6, 0, 0)

    def at(hours, minute=0):
        return h0 + dt.timedelta(hours=hours, minutes=minute)

    rows = [
        (1, at(0), 1, "view", 4.0, "{}"),
        (2, at(0, 30), 1, "view", 6.0, "{}"),       # h0 sums to 10
        (3, at(24), 1, "view", 12.0, "{}"),          # |12-10| = 2
        (4, at(25), 1, "view", 7.0, "{}"),           # no t-24h pair
        (5, at(48), 1, "view", 12.0, "{}"),          # |12-12| = 0
        (6, at(1), 2, "click", 5.0, "{}"),           # user 2: single hour
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r.user_id: (r.n_evals, r.sum_abs_err, r.mae, r.n_exact)
        for r in timeseries_seasonal_naive_eval(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 2.0, 1.0, 1)}


def test_seasonal_naive_eval_dst_wall_clock(spark, tmp_path):
    """ADVICE r11 #4: the hour bucket and the 24 h lag must be pure
    wall-clock (TIMESTAMP_NTZ) so a DST session timezone cannot split the
    engines. Planted: a forecast target INSIDE the spring-forward gap
    (2024-03-10 02:30 America/New_York does not exist locally — a coerced
    date_trunc shifts it to the 03:00 bucket and loses the pair) and a
    fall-back hour whose two local 01:xx readings must merge into ONE
    wall-clock bucket. Runs under an America/New_York session and checks
    both the hand-derived answer and bit-exact DuckDB parity."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_demo_spark.queries.analytics import timeseries_seasonal_naive_eval
    from kinesis_demo_spark.registry import all_oracle_sql

    def ts(s):
        import datetime as dt

        return dt.datetime.fromisoformat(s)

    rows = [
        # user 1: spring-forward gap target
        (1, ts("2024-03-09 02:30:00"), 1, "view", 10.0, "{}"),
        (2, ts("2024-03-10 02:30:00"), 1, "view", 13.0, "{}"),  # gap hour
        # user 2: fall-back ambiguous hour, two readings one wall bucket
        (3, ts("2024-11-02 01:30:00"), 2, "view", 5.0, "{}"),
        (4, ts("2024-11-03 01:15:00"), 2, "view", 2.0, "{}"),
        (5, ts("2024-11-03 01:45:00"), 2, "view", 3.5, "{}"),
    ]
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = {
            r.user_id: (r.n_evals, r.sum_abs_err, r.mae, r.n_exact)
            for r in timeseries_seasonal_naive_eval(spark, str(tmp_path)).collect()
        }
        assert got == {1: (1, 3.0, 3.0, 0), 2: (1, 0.5, 0.5, 0)}

        import duckdb

        from .oracle_harness import compare_counted

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        problems, n = compare_counted(
            timeseries_seasonal_naive_eval(spark, str(tmp_path)),
            con,
            all_oracle_sql()["timeseries_seasonal_naive_eval"],
            "timeseries_seasonal_naive_eval",
        )
        assert not problems and n == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
