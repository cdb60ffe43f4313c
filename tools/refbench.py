#!/usr/bin/env python3
"""Single-node ingestion throughput: reference-equivalent Python loop.

Reproduces the reference's per-point work (etl_job.py:545-738 + 762-844)
— float conversion with skip counting, per-series sorted label arrays
precomputed once, TabSeparated line formatting with escape/array/float
rendering — over a synthetic query_range matrix response. Uses
json.load instead of the reference's ijson event stream, which is
FASTER, so the measured rate is an upper bound on (i.e. favors) the
reference. Writes the fixture for the Spark twin (graft.IngestBench).

Usage: python3 tools/refbench.py [n_series] [points_per_series]
"""
import json, math, random, sys, time

def build_fixture(path, n_series, n_points, n_docs=32):
    """n_docs response documents, one JSON per line — the shape a batch
    of query_range fetches lands in a drop directory, and what lets the
    Spark twin parallelize across documents like real ingest."""
    random.seed(42)
    with open(path, "w") as f:
        for d in range(n_docs):
            series = []
            for s in range(d * n_series // n_docs, (d + 1) * n_series // n_docs):
                base = 1700000000 + s
                values = [[base + i * 15, str(round(random.uniform(0, 100), 3))]
                          for i in range(n_points)]
                series.append({
                    "metric": {"__name__": f"metric_{s % 20}",
                               "job": f"job{s % 7}", "instance": f"host{s}"},
                    "values": values})
            f.write(json.dumps({
                "status": "success",
                "data": {"resultType": "matrix", "result": series}}) + "\n")

# --- reference semantics (etl_job.py:762-844), reimplemented verbatim ---
def escape_ts(value):
    return value.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

def ch_array(arr):
    if not arr:
        return "[]"
    return "[" + ",".join("'" + escape_ts(e).replace("'", "\\'") + "'"
                          for e in arr) + "]"

def format_float(value):
    if math.isnan(value):
        return "nan"
    if math.isinf(value):
        return "inf" if value > 0 else "-inf"
    formatted = f"{value:.15g}"
    if "e" in formatted.lower():
        formatted = f"{value:.15f}".rstrip("0").rstrip(".")
    return formatted

def parse(path, out_path):
    rows = skipped = 0
    with open(path) as f:
        responses = [json.loads(line) for line in f]
    with open(out_path, "w") as out:
      for resp in responses:
        for s in resp["data"]["result"]:
            metric = s["metric"]
            name = metric.get("__name__", "")
            labels = dict(sorted((k, v) for k, v in metric.items()
                                 if k != "__name__"))
            keys_str = ch_array(list(labels.keys()))
            values_str = ch_array(list(labels.values()))
            name_esc = escape_ts(name)
            for pair in s["values"]:
                if len(pair) != 2:
                    continue
                ts = float(pair[0])
                try:
                    val = float(pair[1])
                except (TypeError, ValueError):
                    skipped += 1
                    continue
                out.write(f"{ts:.6f}\t{name_esc}\t{keys_str}\t"
                          f"{values_str}\t{format_float(val)}\n")
                rows += 1
    return rows, skipped

def main():
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    fixture = "/tmp/prom_ingest_bench.json"
    build_fixture(fixture, n_series, n_points)
    t0 = time.time()
    rows, skipped = parse(fixture, "/tmp/prom_ingest_ref.tsv")
    dt = time.time() - t0
    print(json.dumps({
        "engine": "reference-equivalent (python, json.load — faster than "
                  "the reference's ijson)",
        "rows": rows, "skipped": skipped,
        "sec": round(dt, 3), "rows_per_sec": round(rows / dt)}))

if __name__ == "__main__":
    main()
