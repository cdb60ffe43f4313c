#!/usr/bin/env python3
"""Generate the cityHash64 row-id oracle lookup (driver-side tooling).

For each testdata SF, recompute q_metrics_id_city's ids with the
INDEPENDENT Python twin (tools/cityhash_ref.py) — same derivation as
MetricsEtl.metrics(): ts_us = epoch micros, name = event_type, labels =
props JSON (minus any 'user' key) ∪ {user → user_id}, keys sorted,
values aligned — and store (event_id, ts_us, city_id) as parquet.
(event_id, ts) is verified unique across the SF union, so ONE combined
lookup serves whichever SF the oracle runs against, joined on both keys.

The oracle SQL in SparkEntry then becomes a plain join against this
file, turning the driver's q_metrics_id_city check from rows-only into
a full rows+schema+hash compare whose expected values come from an
implementation the Scala code shares nothing with.

Usage: python3 tools/gen_cityhash_lookup.py [sfdir ...]
       (default: /root/testdata/sf0.001 sf0.01 sf0.1)
Writes: tools/fixtures/cityhash_ids.parquet
"""
import json
import os
import struct
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cityhash_ref import row_id  # noqa: E402

DEFAULT_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                "/root/testdata/sf0.1"]


def json_scalar_str(v):
    """Spark from_json(MapType(String,String)) renders JSON scalars as
    their literal token text; for the int-valued props here that is just
    str(int). Guard the other scalar shapes for robustness."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    return str(v)


def lookup_rows(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_id", "ts", "user_id", "event_type",
                               "value", "props"])
    ts_ns = t.column("ts").cast(pa.int64()).to_pylist()
    event_id = t.column("event_id").to_pylist()
    user_id = t.column("user_id").to_pylist()
    name = t.column("event_type").to_pylist()
    value = t.column("value").to_pylist()
    props = t.column("props").to_pylist()
    out = []
    for i in range(len(event_id)):
        labels = {k: json_scalar_str(v)
                  for k, v in json.loads(props[i]).items() if k != "user"}
        labels["user"] = str(user_id[i])
        keys = sorted(labels)
        values = [labels[k] for k in keys]
        ts_us = ts_ns[i] // 1000
        cid = row_id(ts_us, name[i], keys, values, value[i])
        out.append((event_id[i], ts_us, str(cid)))  # unsigned decimal
    return out


def main():
    dirs = sys.argv[1:] or DEFAULT_DIRS
    rows = []
    for d in dirs:
        r = lookup_rows(d)
        print(f"{d}: {len(r)} ids")
        rows.extend(r)
    keys = [(e, t) for e, t, _ in rows]
    assert len(set(keys)) == len(keys), "(event_id, ts_us) not unique!"
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts_us": pa.array([r[1] for r in rows], pa.int64()),
        "city_id": pa.array([r[2] for r in rows], pa.string()),
    })
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "cityhash_ids.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
