#!/usr/bin/env python
"""Generate the sf1 events fixture for the serving-path scaling measurement
(VERDICT r6 #7): a deterministic 10x user-space replication of the read-only
driver fixture at sf0.1 — same 30-day span, 10x users, 10x rows, which is
the axis the driver's own sf series grows along (more users emitting at the
same cadence). No RNG anywhere: replica k shifts user_id by 1500*k,
event_id by 100000*k, and ts by k seconds (so replicas don't collide on the
(user, ts) serving key but the window density scales exactly 10x).

Writes /tmp/sf1/events.parquet (~15 MB — a measurement input, not a repo
artifact; re-run this script to regenerate it anywhere).

Usage: python tools/gen_sf1_events.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1/events.parquet"
REPLICAS = 10
USER_STRIDE = 1500      # sf0.1's user-id space size
EVENT_STRIDE = 100_000  # sf0.1's event-id space size


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "events.parquet")
    con = duckdb.connect()
    con.sql(
        f"""
COPY (
  SELECT
    event_id + {EVENT_STRIDE}*k.k AS event_id,
    ts + INTERVAL (k.k) SECOND AS ts,
    user_id + {USER_STRIDE}*k.k AS user_id,
    event_type, value, props
  FROM '{SRC}', (SELECT unnest(range({REPLICAS})) AS k) k
  ORDER BY ts
) TO '{out}' (FORMAT PARQUET)
"""
    )
    print(
        con.sql(
            f"SELECT count(*), min(user_id), max(user_id), min(ts), max(ts) FROM '{out}'"
        ).fetchall()
    )


if __name__ == "__main__":
    main()
