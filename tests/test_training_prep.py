"""Semantic invariants for the training-prep operators (the oracle parity
test proves cross-engine equality; these prove the operators mean what they
claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_demo_spark.queries.training_prep import (
    DEFAULT_RATE_PCT,
    PACK_BUDGET_TOKENS,
    PACK_SHARDS,
    QUANT_LEVELS,
    SAMPLE_RATES_PCT,
    embedding_quantize_int8,
    sample_stratified_documents,
    sequence_packing,
)
from kinesis_demo_spark.io import load_table

from .conftest import SF_SMOKE


def test_stratified_sample_rates_land_near_targets(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r["lang"]: r["n"]
        for r in sample_stratified_documents(spark, SF_SMOKE)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, total in totals.items():
        rate = SAMPLE_RATES_PCT.get(lang, DEFAULT_RATE_PCT) / 100
        got = kept.get(lang, 0) / total
        # h60 is uniform; at fixture sizes allow a wide but meaningful band
        assert abs(got - rate) < 0.2, (lang, got, rate)


def test_stratified_sample_is_reproducible(spark):
    a = {r["doc_id"] for r in sample_stratified_documents(spark, SF_SMOKE).collect()}
    b = {r["doc_id"] for r in sample_stratified_documents(spark, SF_SMOKE).collect()}
    assert a == b and a


def test_packing_respects_budget_and_order(spark):
    rows = sequence_packing(spark, SF_SMOKE).collect()
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in load_table(spark, SF_SMOKE, "documents").select("doc_id").collect()
    }
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (_, _), members in by_bin.items():
        total = sum(m["n_tokens"] for m in members)
        # a bin only exceeds the budget when a single oversized doc owns it
        assert total <= PACK_BUDGET_TOKENS or len(members) == 1
    # bins are contiguous doc_id runs within each shard
    for shard in range(PACK_SHARDS):
        ordered = sorted((r for r in rows if r["shard"] == shard), key=lambda r: r["doc_id"])
        bins = [r["bin"] for r in ordered]
        assert bins == sorted(bins)


def test_quantization_bounds_and_roundtrip_error(spark):
    q = embedding_quantize_int8(spark, SF_SMOKE)
    assert q.filter((F.col("q") > QUANT_LEVELS) | (F.col("q") < -QUANT_LEVELS)).count() == 0
    # |x - q*scale| <= scale/2 except at the clamp boundary
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select("vec_id", (F.col("pos") + 1).alias("dim"), "x")
    joined = q.join(emb, ["vec_id", "dim"]).select(
        "q", "scale", (F.abs(F.col("x").cast("double") - F.col("q") * F.col("scale"))).alias("err")
    )
    bad = joined.filter(
        (F.col("err") > F.col("scale") * 0.5 + 1e-12) & (F.abs(F.col("q")) != QUANT_LEVELS)
    )
    assert bad.count() == 0


# --- BFD packing -------------------------------------------------------------


def test_bfd_packing_matches_python_reference_and_beats_greedy(spark):
    import duckdb

    from kinesis_demo_spark.queries.training_prep import (
        PACK_BUDGET_TOKENS,
        PACK_SHARDS,
        packing_efficiency_report,
    )

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT doc_id, length(string_split(text, ' ')) FROM '{sf}/documents.parquet'"
    ).fetchall()

    def ref_bfd(docs):
        docs = sorted(docs, key=lambda d: (-d[1], d[0]))
        bins = []
        for _, toks in docs:
            best, best_left = -1, None
            for b, left in enumerate(bins):
                if toks <= left and (best_left is None or left < best_left):
                    best, best_left = b, left
            if best < 0:
                bins.append(max(0, PACK_BUDGET_TOKENS - toks))
            else:
                bins[best] -= toks
        return len(bins)

    want_bins = {
        s: ref_bfd([(d, t) for d, t in rows if d % PACK_SHARDS == s])
        for s in range(PACK_SHARDS)
    }
    got = packing_efficiency_report(spark, sf).collect()
    bfd = {r.shard: r for r in got if r.algorithm == "best_fit_decreasing"}
    greedy = {r.shard: r for r in got if r.algorithm == "greedy_inorder"}
    for s in range(PACK_SHARDS):
        assert bfd[s].bins_used == want_bins[s], s
        # BFD never uses more bins than in-order greedy
        assert bfd[s].bins_used <= greedy[s].bins_used, s
        assert bfd[s].token_sum == greedy[s].token_sum, s


def test_concat_chunk_sequences_tile_the_stream_exactly(spark):
    """Sequence formation invariants: sequences tile the concatenated
    stream — every sequence is exactly SEQ_LEN tokens except the last,
    totals conserve (sum n_tokens == sum doc stream lengths), and a
    sequence spanning k docs has first != last for k > 1."""
    from kinesis_demo_spark.queries.training_prep import SEQ_LEN, concat_chunk_sequences

    sf = "/root/testdata/sf0.001"
    rows = sorted(concat_chunk_sequences(spark, sf).collect(), key=lambda r: r.seq_id)
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    total = sum(r.n_tokens for r in rows)
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    # stream length per doc = token count + 1 EOS; str.split(" ") matches
    # F.split's behavior including the empty-string edge
    expect_total = sum(len(d.text.split(" ")) + 1 for d in docs)
    assert total == expect_total
    for r in rows[:-1]:
        assert r.n_tokens == SEQ_LEN, r
    assert 0 < rows[-1].n_tokens <= SEQ_LEN
    for r in rows:
        assert r.n_docs_spanned >= 1
        assert (r.first_doc == r.last_doc) == (r.n_docs_spanned == 1)
