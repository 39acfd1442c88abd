#!/usr/bin/env python
"""Adversarial micro-fixture generator (r8): the same ten tables as the
driver fixtures, but every distribution is an edge case — the latent-break
hunt that found the datacard even-median bug (ADVICE r7) generalized into a
reusable gate. ``tools/parity_sweep.py /tmp/sfadv PARITY_ADVERSARIAL.json``
then runs EVERY registered query against its DuckDB oracle on this data, so
any engine-vs-oracle disagreement that the benign driver fixtures mask
(tie-break order, NULL semantics, empty groups, zero spreads, missing
categories, duplicate keys) turns into a red row.

Deliberate shapes:
- events: 50% of rows on one user (skew); 120 events inside ONE second
  (window ties); identical (ts) pairs with distinct event_id (ordering must
  be (ts, event_id)-total); duplicate event_ids (the streaming-dedup case);
  NULL user_id / event_type / value / props plus empty and CORRUPT props
  JSON; one event_type whose values are all identical (MAD = 0, zero
  variance); a value stretch that is all first-digit-1 (Benford's missing
  digits); events at exact midnight boundaries.
- documents: exact duplicate texts; a 64-char shared substring at different
  offsets; empty text; whitespace-only text; single-char doc; pathological
  repetition; NULL and empty lang; EVEN doc count with distinct middle
  lengths (the r7 median bug class).
- embeddings: exact duplicate vectors (cosine ties), a near-constant
  vector, tight duplicate clusters, one label owning half the corpus.
- TPC-H: an order with 30 lines (pair blow-up); orders with no lineitems
  and customers with no orders (outer-join edges); one returnflag class
  absent entirely; duplicate (orderkey, partkey) lines; price/balance ties
  everywhere; a region with no nations; a CUSTOMER-ONLY nation (r11,
  VERDICT r10 #2 — gives set_ops_nations' EXCEPT leg its first non-empty
  rows at any fixture).

All randomness is a fixed LCG — the fixture is byte-reproducible.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ARGS = [a for a in sys.argv[1:] if a not in ("--unicode", "--nulls", "--skew", "--time")]
UNICODE = "--unicode" in sys.argv[1:]
# --nulls (r10, from the r9 ADVICE class): NULL join/agg KEYS the base
# fixture never carries — NULL l_partkey/l_suppkey lineitem rows, a
# NULL-text and a NULL-everything document — so count(DISTINCT)-vs-filter
# asymmetries and silently-dropping inner joins split the engines here
# before a production corpus finds them.
NULLS = "--nulls" in sys.argv[1:]
# --skew (r11, VERDICT r10 #8): EXTREME key skew — one user takes 90% of
# events inside one hot second band, one boilerplate sentence appears in
# EVERY document (a shingle with df == n_docs, the hot inverted-index
# bucket), one exact duplicate text owns a third of the corpus, one part
# rides half of all orders (a co-purchase hub), and half the embedding
# corpus is one exact vector (a degenerate LSH/IVF bucket). The class
# probes tie-breaking and aggregation under pathological fan-in — where a
# wrong any_value/first, a non-commutative fold, or a hash-collision
# assumption splits the engines.
SKEW = "--skew" in sys.argv[1:]
# --time (r12, VERDICT r11 #3): TEMPORAL EXTREMES — the sixth hostile class.
# The session-TZ axis has been hostile since r8, but the DATA was always
# benign 2024 timestamps; this class plants hostile INSTANTS instead:
# pre-1970 negative epochs (sign/floor-vs-truncate bugs in epoch math),
# rows crossing epoch zero exactly (+-1 us), DST spring-forward-gap and
# fall-back-repeat LOCAL times (naive values a DST zone cannot represent
# uniquely), and TIMESTAMP(NANOS) values within seconds of the int64
# nanosecond range edges (1677-09-21 / 2262-04-11) carrying sub-microsecond
# residues — the events table is written as parquet TIMESTAMP(NANOS) like
# the driver fixtures, so load_table's `ts DIV 1000` normalization runs
# against negative and near-overflow nanos. Each hostile era gets its OWN
# user ids (>= 100): the gapfill family's dense grid is per-user, so eras
# must never share a user or the contract output explodes to centuries of
# hours. TPC-H gets a pre-1970 order and a year-9999 order, plus matching
# lineitems.
TIME = "--time" in sys.argv[1:]
OUT = ARGS[0] if ARGS else (
    "/tmp/sfuni" if UNICODE
    else ("/tmp/sfskew" if SKEW else ("/tmp/sftime" if TIME else "/tmp/sfadv"))
)

SEED = 0x5EED


def lcg(n: int, mod: int, seed: int = SEED):
    x = seed
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        yield x % mod


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def events_rows():
    rows = []
    eid = 0

    def add(ts, user, etype, value, props):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    # skew block: user 0 takes half the table, values Benford-hostile
    # (every value starts with digit 1), spread over 2 days
    for i in range(300):
        add(_ts(i * 577.0), 0, ("view", "click")[i % 2], 1.0 + (i % 9) / 10 + (i % 3) * 10 ** (i % 3), f'{{"k": {i % 7}}}')
    # window-tie block: 120 events inside ONE second, 3 users, same-ts pairs
    for i in range(120):
        add(_ts(100000 + (i % 4) * 0.25), 1 + i % 3, "purchase", 2.5, f'{{"k": {i}}}')
    # MAD-zero block: event_type 'scroll' has ONE value everywhere
    for i in range(60):
        add(_ts(200000 + i * 37.0), 4 + i % 5, "scroll", 5.0, '{"k": 1}')
    # NULL block
    for i in range(20):
        add(_ts(300000 + i * 61.0), None if i % 4 == 0 else 9 + i % 3, None if i % 5 == 0 else "error", None if i % 3 == 0 else 9.31, None)
    # corrupt/empty props
    for i in range(20):
        add(_ts(310000 + i * 53.0), 12 + i % 2, "signup", 64.25, "" if i % 2 == 0 else "{not json")
    # midnight boundaries + sentinel runs
    for d in range(1, 4):
        add(dt.datetime(2024, 1, d, 0, 0, 0), 14, "error", 0.0, '{"k": 0}')
        add(dt.datetime(2024, 1, d, 0, 0, 0), 15, "view", 327.53, '{"k": 6}')
    # duplicate event_ids (replayed transport): re-emit 10 earlier rows as-is
    rows.extend(rows[5:15])
    # single-event users at the far edge
    for u in range(20, 25):
        add(_ts(400000 + u), u, "purchase", 0.03, '{"k": 3}')
    if SKEW:
        # push user 0 to ~90% of the table: 600 events inside ONE hot
        # second (max window/tie fan-in on one key) + 2400 spread across
        # two days — the shape where a per-user window, a salted sum, or a
        # sessionizer meets a partition 10x every other key combined
        for i in range(600):
            add(_ts(500000 + (i % 200) * 0.005), 0, "view", 1.0 + (i % 7), f'{{"k": {i % 5}}}')
        for i in range(2400):
            add(_ts(510000 + i * 61.0), 0, ("click", "purchase", "view")[i % 3],
                2.0 + (i % 13), f'{{"k": {i % 9}}}')
    if TIME:
        # --- temporal extremes (users >= 100; one era per user block) ---
        # ts here may be a raw int64 NANOSECOND epoch (negative / near the
        # int64 edges / sub-us residues) — write() converts datetimes to ns
        # under TIME and passes ints through.
        NS_US = 1000
        NS_S = 1_000_000_000

        # (a) epoch-zero crossing, sub-us residues: -1.5us, -999ns, -1ns,
        # 0, +1ns, +999ns, +1.5us — the DIV-vs-cast truncation boundary
        for j, ns in enumerate((-1500, -999, -1, 0, 1, 999, 1500)):
            add(ns, 100, "view", 1.0 + j, f'{{"k": {j}}}')
        # (b) pre-1970 block: users 101-103, four days up to the epoch,
        # hourly cadence with residues — negative epoch s/ms math,
        # pre-epoch windows/gapfill/LOCF/seasonal pairs (24 h apart)
        for i in range(96):
            ns = -(4 * 86400 - i * 3600) * NS_S + (i % 3) * 333 + (i % 7) * NS_US
            add(ns, 101 + i % 3, ("view", "click", "error")[i % 3],
                1.0 + (i % 11), f'{{"k": {i % 5}}}')
        # (c) DST spring-forward gap (America/New_York 2024-03-10
        # 02:00-03:00 does not exist locally): users 105-107, two days
        # around the transition including 02:15/02:30/02:45 gap locals
        for i in range(48):
            add(dt.datetime(2024, 3, 9, 0, 0) + dt.timedelta(hours=i),
                105 + i % 3, ("view", "click")[i % 2], 2.0 + (i % 9), '{"k": 1}')
        for m in (15, 30, 45):
            add(dt.datetime(2024, 3, 10, 2, m), 105, "purchase", 9.5, '{"k": 2}')
        # (d) DST fall-back repeat (2024-11-03 01:xx occurs twice locally):
        # users 108-110, two days around it plus three 01:xx readings
        for i in range(48):
            add(dt.datetime(2024, 11, 2, 0, 0) + dt.timedelta(hours=i),
                108 + i % 3, ("view", "error")[i % 2], 3.0 + (i % 7), '{"k": 3}')
        for m in (10, 30, 50):
            add(dt.datetime(2024, 11, 3, 1, m), 108, "purchase", 4.25, '{"k": 4}')
        # (e)/(f) nanos int64 range edges. The compare harness's arbiter is
        # pandas, whose Timestamp domain IS the int64-ns range — so derived
        # values (day truncation, window starts, ts + interval) must stay
        # representable too. A 3-day margin off each edge keeps every
        # derived timestamp in-domain while the raw values still exercise
        # near-overflow `DIV 1000` normalization and sub-us residues; the
        # exact +-(2^63-1) edge is untestable through a pandas-backed
        # differential and is pinned Spark-side in tests instead.
        margin = 3 * 86400 * NS_S
        # (e) near-MAX block: anchored in LATE MARCH 2262 (11 days under the
        # 2262-04-11T23:47:16 edge) — not just a 3-day margin, because
        # CALENDAR derivations reach further than interval arithmetic:
        # last_day() of an April-2262 event is 2262-04-30, out of the
        # pandas domain (caught by scalar_extended_battery on the first
        # 3-day-margin cut); March's month-end 2262-03-31 stays in-domain.
        max_ns = (1 << 63) - 1 - 11 * 86400 * NS_S
        for i in range(48):
            add(max_ns - (48 - i) * 3600 * NS_S + (i % 5) * 777,
                115 + i % 2, ("view", "click")[i % 2], 5.0 + (i % 6), '{"k": 5}')
        add(max_ns - 1000, 115, "purchase", 6.5, '{"k": 6}')
        # (f) near-MIN block (1677-09-24, 3 days above 1677-09-21T00:12:43)
        min_ns = -(1 << 63) + 1 + margin
        for i in range(48):
            add(min_ns + (i + 1) * 3600 * NS_S + (i % 5) * 777,
                117 + i % 2, ("view", "error")[i % 2], 7.0 + (i % 4), '{"k": 7}')
    return rows


def unicode_documents_rows():
    """The unicode axis (kept out of the MAIN fixture: the multimodal
    oracles' byte==char identity is documented ASCII-only): mixed-width
    UTF-8 (1-4 bytes/char), exact dups with accents, simplified/traditional
    CJK, decomposed accents (NFD), Greek final sigma, the Turkish dotted I
    (the classic full-vs-simple case-mapping divergence), German sharp s,
    zero-width characters, fullwidth forms, and docs shorter than the
    shingle width (empty shingle sets). Caught in r8: DuckDB's lower()
    dropping U+0130's combining dot, and sorted-neighborhood dividing by a
    zero Jaccard union on shingle-less pairs."""
    docs = [
        "héllo wörld naïve café déjà vu",
        "héllo wörld naïve café déjà vu",            # exact dup with accents
        "中文分词 是 自然 语言 处理 的 基础 任务",
        "中文分词 是 語言 處理 的 基礎",               # simplified vs traditional
        "русский текст про обработку языка и данных",
        "mixed ascii und ümlauts züsammen ökonomie",
        "🎉 emoji 🚀 tokens 🌍 everywhere 🎯 now",
        "éclair école étude",                         # NFD decomposed accents
        "ΑΒΓ αβγ ΣΙΓΜΑ σίγμα τέλος",                # greek incl. final sigma
        "İstanbul ırmak IJssel straße MASSE masse",   # dotted I, sharp s
        "a­a b​b c⁠c",                 # soft hyphen, zero-width
        "ｗｉｄｅ ａｓｃｉｉ ﾊﾝｶｸ ｶﾅ",              # fullwidth/halfwidth forms
        # BM25 query-term plants (r11, mixed with multibyte context): the
        # retrieval family queries ("spark", "hash", "window") — without
        # them the BM25/PRF rows are 0-row matches on this fixture too
        "spark スパーク hash ハッシュ window ウィンドウ",
        "die spark engine nutzt hash joins im window verfahren",
        "спарк spark окно window хеш hash",
        # exact-substring + intradoc-repeat plants (r11): a >=130-char
        # shared CYRILLIC passage at different offsets (dedup_substring_runs
        # must count anchor positions in CHARS, not bytes — 2 bytes/char
        # here) and a thrice-repeated multibyte word trigram
        # (text_intradoc_repeats) — without these both rows were 0-row
        # matches on this fixture
        "начало первого документа "
        + "повторяющийся длинный отрывок текста для проверки точного "
          "совпадения подстрок в юникоде где каждый символ занимает два "
          "байта в кодировке",
        "повторяющийся длинный отрывок текста для проверки точного "
        "совпадения подстрок в юникоде где каждый символ занимает два "
        "байта в кодировке — и другой конец",
        "катя пошла домой и снова катя пошла домой и опять катя пошла домой",
    ]
    k = 0
    while len(docs) < 24:  # even count, multibyte length ladder
        docs.append(" ".join("中" * (j + 1) for j in range(k + 1)))
        k += 1
    langs = ["zh", "ru", "de", "fr", "el", "tr"]
    return [
        (i, t, langs[i % len(langs)], f"src{i % 3}", len(t))
        for i, t in enumerate(docs)
    ]


def documents_rows():
    shared = "the quick brown fox jumps over the lazy dog again and again forever"  # 67 chars
    docs = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup x3
        "prefix words " + shared,
        shared + " suffix words here",
        "",                    # empty text
        "   ",                 # whitespace only
        "x",                   # single char
        "spam spam spam spam spam spam spam spam spam spam",
        "one two three four five six seven eight nine ten eleven twelve",
        "uno dos tres cuatro cinco seis siete ocho nueve diez",
        # BM25 query-term plants (r11): the retrieval family's query is
        # ("spark", "hash", "window") — without these the BM25/PRF/hard-
        # negative rows hash-match over the EMPTY set on this fixture
        "spark shuffles the hash join while the window closes",
        "a window into spark internals",
        "hash partitioning and hash aggregation in spark",
    ]
    # even-count median trap: pad to an EVEN total with a strictly
    # increasing length ladder so the two middle lengths DIFFER
    k = 0
    while len(docs) < 40:
        docs.append(" ".join(f"w{k}x{j}" for j in range(k + 1)))
        k += 1
    if SKEW:
        # one boilerplate sentence in EVERY non-empty doc: a shingle whose
        # df == n_docs (the hottest possible inverted-index bucket — the
        # df-cap and prefix-filter paths MUST prune it, the uncapped index
        # must still aggregate it exactly); plus one exact text owning a
        # third of the corpus (hot md5 group, hot MinHash band)
        boiler = " all rights reserved subscribe to our newsletter for updates"
        docs = [d + boiler if d.strip() else d for d in docs]
        docs.extend([docs[0]] * 20)
    langs = ["en", "en", "en", "de", None, "", "zh", "fr", "es", "en"]
    rows = []
    for i, text in enumerate(docs):
        rows.append(
            (i, text, langs[i % len(langs)], f"src{i % 3}", len(text))
        )
    if NULLS:
        rows.append((len(rows), None, "en", "src0", None))   # NULL text
        rows.append((len(rows), None, None, None, None))     # NULL everything but the key
    return rows


def embeddings_rows():
    dim = 64
    rows = []
    g = lcg(10_000, 1000)
    vals = [next(g) for _ in range(64 * 48)]
    dup_n = 24 if SKEW else 6
    for i in range(48):
        if i < dup_n:
            # exact duplicate cluster: 6 identical vectors (24 under --skew:
            # half the corpus in ONE LSH/IVF bucket with cosine == 1.0 ties)
            vec = [float(j % 7) / 7.0 + 0.01 for j in range(dim)]
        elif i < 10:
            # near-constant vector (tiny spread, nonzero norm)
            vec = [0.001 + (0.0001 if j == i else 0.0) for j in range(dim)]
        else:
            vec = [vals[i * dim + j] / 1000.0 + 0.001 for j in range(dim)]
        label = 1 if i < 24 else (i % 10)  # one label owns half the corpus
        rows.append((i, [float(f"%.6g" % v) for v in vec], label))
    return rows


def tpch_rows():
    region = [(0, "DUPNAME"), (1, "DUPNAME"), (2, "EMPTYREGION")]
    # nation 4 is CUSTOMER-ONLY (no supplier ever lands there: suppliers use
    # s % 4): plants rows for set_ops_nations' EXCEPT leg, which was vacuous
    # at every fixture — customer nations were a subset of supplier nations
    # (VERDICT r10 #2)
    nation = [(0, "NAT_A", 0), (1, "NAT_A", 0), (2, "NAT_B", 1), (3, "NAT_C", 1), (4, "NAT_CUSTONLY", 0)]
    customer = [
        (c, f"Customer#{c}", c % 3 if c < 15 else 3, 100.0 if c % 2 == 0 else -5.5, "BUILDING" if c < 20 else "AUTOMOBILE")
        for c in range(25)
    ]
    # customers in the customer-only nation; both are also ORDER-LESS
    # (orders reference custkey 0..14), so the anti-join signal gets two
    # more rows; #26 is rich (>9000) so the full-outer join keeps a
    # customer-only nation row on the rich-customer side too
    customer.append((25, "Customer#25", 4, 42.0, "MACHINERY"))
    customer.append((26, "Customer#26", 4, 9500.0, "BUILDING"))
    supplier = [(s, f"Supplier#{s}", s % 4, 100.0, ) for s in range(10)]
    supplier = [(s, n, k, b) for (s, n, k, b) in supplier]
    part = [
        (p, f"part {'common' if p < 10 else p} name", f"Brand#{p % 2}", "ECONOMY ANODIZED STEEL" if p % 3 == 0 else "STANDARD BURNISHED TIN", 5 if p < 20 else p, 100.0 + (p % 4))
        for p in range(30)
    ]
    orders = []
    for o in range(60):
        cust = 0 if o < 15 else (o % 15)  # customers 15..24 have NO orders
        date = dt.datetime(2024, 1, 1) if o < 20 else dt.datetime(2024, 1 + o % 3, 1 + o % 28)
        # two big-ticket orders (r11): semi_join_customers_with_orders
        # filters o_totalprice > 200000 — without these its row is a
        # vacuous 0-row match on this fixture
        price = 250000.0 if o in (3, 4) else 1000.0
        orders.append((o, cust, "O" if o % 2 == 0 else "F", price, date, "1-URGENT" if o < 48 else f"{1 + o % 5}-X"))
    lineitem = []
    ln = 0
    for o in range(55):  # orders 55..59 have NO lineitems
        nlines = 30 if o == 0 else 1 + o % 4
        for i in range(nlines):
            part_k = i % 30 if o == 0 else (o * 7 + i) % 30
            lineitem.append(
                (o, part_k, (o + i) % 10, i + 1, 50.0 if o % 5 == 0 else 1.0 + i, 100.0, 0.0 if o % 2 == 0 else 0.05, 0.04, "A" if o % 3 == 0 else "N", "O", dt.datetime(2024, 1, 1 + o % 28))
            )
            ln += 1
    # duplicate (orderkey, partkey) pair on the big order
    lineitem.append((0, 0, 9, 31, 2.0, 100.0, 0.0, 0.04, "A", "O", dt.datetime(2024, 1, 5)))
    if SKEW:
        # hot part 0 rides HALF of all orders: a co-purchase hub whose
        # degree dwarfs the rest of the graph (triangle/k-core/pagerank
        # skew bound) and a join key owning half the fact table
        for o in range(1, 55, 2):
            lineitem.append((o, 0, (o * 3) % 10, 90 + o, 2.0 + o % 3, 75.0,
                             0.0, 0.04, "N", "O", dt.datetime(2024, 1, 1 + o % 28)))
    # link-prediction plant (r11): parts 30/31 hang off the big clique
    # through part 30 only — part 31 shares neighbor 30 with part 5 but is
    # NOT adjacent to part 5, so graph_linkpred_common_neighbors has
    # non-adjacent candidates on this fixture (orders 100/101 deliberately
    # have no orders-table row: orphan FK rows are adversarial signal for
    # the outer-join family, and parts 30/31 are orphan part keys)
    lineitem.append((100, 5, 0, 1, 1.0, 10.0, 0.0, 0.04, "N", "O", dt.datetime(2024, 1, 10)))
    lineitem.append((100, 30, 1, 2, 1.0, 10.0, 0.0, 0.04, "N", "O", dt.datetime(2024, 1, 10)))
    lineitem.append((101, 30, 2, 1, 1.0, 10.0, 0.0, 0.04, "N", "O", dt.datetime(2024, 1, 11)))
    lineitem.append((101, 31, 3, 2, 1.0, 10.0, 0.0, 0.04, "N", "O", dt.datetime(2024, 1, 11)))
    if NULLS:
        # NULL part/supp keys on a real order: distinct counts, grouping,
        # and part/supplier joins must agree on NULL exclusion
        lineitem.append((1, None, None, 99, 3.0, 50.0, 0.0, 0.04, "N", "O", dt.datetime(2024, 1, 7)))
        lineitem.append((2, None, 3, 98, 4.0, 60.0, 0.05, 0.04, "A", "F", dt.datetime(2024, 1, 9)))
    if TIME:
        # temporal extremes in the TPC-H date columns: a pre-1970 order
        # (negative-epoch o_orderdate) and a far-future order at the pandas
        # ns-domain ceiling (year 9999 is valid us-timestamp data but
        # unrepresentable by the pandas-backed compare harness — pinned
        # Spark-side in tests instead), each with an era-matching lineitem
        # — date filters, date diffs, and month math must agree on era signs
        # far-future pair sits in MARCH 2262 so month-end derivations
        # (last_day, end-of-month rollups) stay inside the pandas domain
        orders.append((200, 1, "F", 500.0, dt.datetime(1969, 7, 20, 20, 17), "5-LOW"))
        orders.append((201, 2, "O", 750.0, dt.datetime(2262, 3, 5, 23, 59, 59), "1-URGENT"))
        lineitem.append((200, 3, 1, 1, 2.0, 40.0, 0.0, 0.04, "A", "F", dt.datetime(1969, 7, 21)))
        lineitem.append((201, 4, 2, 1, 3.0, 55.0, 0.05, 0.04, "N", "O", dt.datetime(2262, 3, 5)))
    return region, nation, customer, supplier, part, orders, lineitem


_EPOCH = dt.datetime(1970, 1, 1)


def _ns(v) -> int | None:
    """Naive-datetime or raw-int -> int64 epoch nanoseconds (no TZ)."""
    if v is None or isinstance(v, int):
        return v
    return ((v - _EPOCH) // dt.timedelta(microseconds=1)) * 1000


def write(name: str, rows, schema: pa.Schema) -> None:
    cols = list(zip(*rows)) if rows else [[] for _ in schema.names]
    data = {n: list(c) for n, c in zip(schema.names, cols)}
    if TIME and name == "events":
        # the driver fixtures store events.ts as parquet TIMESTAMP(NANOS);
        # this class must exercise the same read path (load_table's
        # `ts DIV 1000`) against negative / near-edge nanos, so ts is
        # written as int64 ns -> timestamp[ns], parquet format 2.6
        data["ts"] = pa.array([_ns(v) for v in data["ts"]], pa.timestamp("ns"))
        schema = pa.schema(
            [f if f.name != "ts" else pa.field("ts", pa.timestamp("ns")) for f in schema]
        )
        table = pa.table(data, schema=schema)
        pq.write_table(table, os.path.join(OUT, f"{name}.parquet"), version="2.6")
        return
    table = pa.table(data, schema=schema)
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    # Positive micro-fixture identification (ADVICE r11 #1): the vacuity
    # gate's "micro" allowance matches ONLY dirs carrying this marker (or a
    # well-known basename) — never "any dir outside /root/testdata", which
    # would silently exempt full-scale fixtures like /tmp/sf1.
    with open(os.path.join(OUT, ".micro-fixture"), "w") as f:
        f.write("hostile micro-fixture written by tools/gen_adversarial_fixture.py\n")
    ts_us = pa.timestamp("us")
    write("events", events_rows(), pa.schema([
        ("event_id", pa.int64()), ("ts", ts_us), ("user_id", pa.int64()),
        ("event_type", pa.string()), ("value", pa.float64()), ("props", pa.string()),
    ]))
    write("documents", unicode_documents_rows() if UNICODE else documents_rows(), pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64()),
    ]))
    write("embeddings", embeddings_rows(), pa.schema([
        ("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())), ("label", pa.int32()),
    ]))
    region, nation, customer, supplier, part, orders, lineitem = tpch_rows()
    write("region", region, pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
    write("nation", nation, pa.schema([
        ("n_nationkey", pa.int32()), ("n_name", pa.string()), ("n_regionkey", pa.int32()),
    ]))
    write("customer", customer, pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()), ("c_nationkey", pa.int32()),
        ("c_acctbal", pa.float64()), ("c_mktsegment", pa.string()),
    ]))
    write("supplier", supplier, pa.schema([
        ("s_suppkey", pa.int64()), ("s_name", pa.string()), ("s_nationkey", pa.int32()),
        ("s_acctbal", pa.float64()),
    ]))
    write("part", part, pa.schema([
        ("p_partkey", pa.int64()), ("p_name", pa.string()), ("p_brand", pa.string()),
        ("p_type", pa.string()), ("p_size", pa.int32()), ("p_retailprice", pa.float64()),
    ]))
    write("orders", orders, pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()), ("o_orderstatus", pa.string()),
        ("o_totalprice", pa.float64()), ("o_orderdate", ts_us), ("o_orderpriority", pa.string()),
    ]))
    write("lineitem", lineitem, pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
        ("l_linenumber", pa.int32()), ("l_quantity", pa.float64()),
        ("l_extendedprice", pa.float64()), ("l_discount", pa.float64()),
        ("l_tax", pa.float64()), ("l_returnflag", pa.string()),
        ("l_linestatus", pa.string()), ("l_shipdate", ts_us),
    ]))
    print(f"adversarial fixture written to {OUT} (unicode={UNICODE})")


if __name__ == "__main__":
    main()
