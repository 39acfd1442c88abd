"""Cross-engine deterministic hashing primitives.

The DuckDB-oracle differential gate needs every hash the engine computes to be
reproducible in ANSI-ish SQL. Spark's ``hash()``/``xxhash64()`` are
Murmur3/XXH64 with Spark-specific seeds — not portable — so all content
hashing here goes through md5 (identical hex output on both engines) reduced
to a 60-bit BIGINT:

    Spark : conv(substr(md5(s), 1, 15), 16, 10) :: long
    DuckDB: fold hex digits of substr(md5(s), 1, 15) via list_reduce

Both are exact integer arithmetic on the same 15 hex digits -> identical
values (probed bit-for-bit in tests/test_hashing.py).

Derived-hash arithmetic (minhash permutations, band hashes, simhash bit
mixing) keeps every intermediate below 2^62 so Spark's wrapping non-ANSI
BIGINT multiply and DuckDB's overflow-checked multiply can never diverge.

Scale note: md5-per-row is whole-stage-codegen JVM work in Spark (no Python
boundary); at 100 TB it is embarrassingly parallel and pipelined into the
scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# 60-bit content hash --------------------------------------------------------

def h60(col: Column) -> Column:
    """Spark: first 15 hex digits of md5 as a BIGINT in [0, 2^60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB fragment computing the identical 60-bit md5 hash."""
    return (
        "list_reduce(list_transform(string_split_regex(substr(md5("
        + expr
        + "),1,15),''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),"
        " (x,y) -> x*16 + y)"
    )


# MinHash universe + permutations -------------------------------------------
#
# h30 = h60 % MINHASH_P maps content into [0, P); each permutation is
# (A_j * h30 + B_j) % P. A_j, B_j < P and h30 < P keep the product < 2^60.

MINHASH_P = 1_000_000_007  # prime, ~2^30

# Fixed, publicly chosen constants (digits of pi/e chunks — nothing magic,
# just deterministic and coprime-ish with P).
MINHASH_A = (
    314159265, 271828182, 161803398, 141421356,
    223606797, 173205080, 264575131, 228942848,
    577215664, 301029995, 693147180, 434294481,
    414213562, 732050807, 449489742, 645751311,
)
MINHASH_B = (
    979323846, 845904523, 874989484, 237309504,
    749978969, 756887729, 106459059, 395671205,
    901532860, 663981195, 559945309, 903251827,
    373095048, 568877293, 660168379, 311064590,
)
N_PERM = len(MINHASH_A)
LSH_BANDS = 4
LSH_ROWS = N_PERM // LSH_BANDS
# Order-independent in-band mixing weights: band_hash = sum(minh * 31^(j % r)).
BAND_W = tuple(31**i for i in range(LSH_ROWS))


# The permutation formula ((A_j * h30 + B_j) % P) is inlined at both use
# sites (queries/dedup.py Spark-side and its oracle SQL) — kept as one
# arithmetic expression there to avoid drift between helper and oracle.
