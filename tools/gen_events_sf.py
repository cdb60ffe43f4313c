#!/usr/bin/env python3
"""EVENTS-ONLY scratch fixture for the third-decade metrics/PromQL
probe (VERDICT_r12 item 2): the events side (etl:metrics shared frame,
native histograms, rate family, alerting) has never been probed past
sf10. sf100 = 100M events. The scale axis is SERIES CARDINALITY (users
x event types), with per-series sample density held at the sf0.1
cadence — how a real long-retention metrics corpus grows (more series,
same scrape interval), and the axis that stresses the per-series
windows. Same construction as gen_sf.py's events table (bootstrap
timestamps/values from sf0.1, fresh dense event ids, uniform users,
json props), chunked through one ParquetWriter.

Usage: python3 tools/gen_events_sf.py /tmp/graft_sf100_events 1000
"""
import json
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(29)
CHUNK = 2000000


def main(outdir, scale):
    os.makedirs(outdir, exist_ok=True)
    n_ev = 100000 * scale
    n_users = 1500 * scale

    src_ts = duckdb.sql(
        f"select ts from '{SRC}/events.parquet'").fetchnumpy()["ts"] \
        .astype("datetime64[us]").astype(np.int64)
    src_type = duckdb.sql(
        f"select event_type from '{SRC}/events.parquet'")\
        .fetchnumpy()["event_type"]
    src_val = duckdb.sql(
        f"select value from '{SRC}/events.parquet'").fetchnumpy()["value"]

    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])
    writer = pq.ParquetWriter(os.path.join(outdir, "events.parquet"),
                              schema)
    written = 0
    while written < n_ev:
        n = min(CHUNK, n_ev - written)
        ets = rng.choice(src_ts, n) + rng.integers(0, 1000000, n)
        writer.write_table(pa.table({
            "event_id": pa.array(
                np.arange(written + 1, written + n + 1), pa.int64()),
            "ts": pa.array(ets, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(1, n_users + 1, n), pa.int64()),
            "event_type": pa.array(rng.choice(src_type, n)),
            "value": np.round(np.abs(
                rng.choice(src_val, n) + rng.normal(0, 0.5, n)), 2),
            "props": [json.dumps({"k": int(k)})
                      for k in rng.integers(0, 100, n)],
        }, schema=schema))
        written += n
        print(f"  events: {written}/{n_ev}", flush=True)
    writer.close()
    print(f"done -> {outdir} (events-only, scale {scale}x sf0.1)")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100_events"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(out, scale)
