#!/usr/bin/env python3
"""sf1.0-shaped scratch fixtures for the scale probe (VERDICT_r06 item 3).

NOT the driver's generator (that is seed=42 and read-only at
/root/testdata — TESTDATA.md forbids touching it). This produces tables
with the SAME schemas and empirically-matched distributions at N x the
sf0.1 cardinalities, into a scratch dir, so Bench can measure
sf0.1 -> sf1.0 per-query scaling. Distribution matching is by
bootstrap: numeric/timestamp columns resample the sf0.1 empirical
values (with jitter where continuous), categorical columns resample the
sf0.1 frequency table, key columns get fresh dense ranges, FKs sample
uniformly over the scaled parent range. documents plants the same
near-dup structure (~5% of docs are edited copies, a handful of exact
dups); embeddings sample per-label centroid + residual noise fit from
sf0.1 and plant ~5% near-dup vectors.

Usage: python3 tools/gen_sf.py /tmp/graft_sf1.0 10
"""
import json
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(7)


def col(table, name):
    return duckdb.sql(
        f"select {name} from '{SRC}/{table}.parquet'").fetchnumpy()[name]


def resample(values, n, jitter=0.0):
    out = rng.choice(values, size=n, replace=True)
    if jitter:
        out = out + rng.normal(0, jitter, size=n)
    return out


def write(outdir, name, table):
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def main(outdir, scale):
    os.makedirs(outdir, exist_ok=True)

    # region/nation: fixed dimension tables, copy verbatim
    for t in ("region", "nation"):
        pq.write_table(
            duckdb.sql(f"select * from '{SRC}/{t}.parquet'").arrow(),
            os.path.join(outdir, f"{t}.parquet"))

    n_cust = 15000 * scale
    n_supp = 1000 * scale
    n_part = 20000 * scale
    n_ord = 150000 * scale
    n_li = 600000 * scale
    n_ev = 100000 * scale
    n_users = 1500 * scale
    n_doc = 5000 * scale
    n_vec = 2000 * scale

    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1), pa.int64()),
        "c_name": [f"Customer#{k:09d}" for k in range(1, n_cust + 1)],
        "c_nationkey": pa.array(
            resample(col("customer", "c_nationkey"), n_cust), pa.int32()),
        "c_acctbal": np.round(
            resample(col("customer", "c_acctbal"), n_cust, jitter=10.0), 2),
        "c_mktsegment": pa.array(
            resample(col("customer", "c_mktsegment"), n_cust)),
    }))

    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(1, n_supp + 1), pa.int64()),
        "s_name": [f"Supplier#{k:09d}" for k in range(1, n_supp + 1)],
        "s_nationkey": pa.array(
            resample(col("supplier", "s_nationkey"), n_supp), pa.int32()),
        "s_acctbal": np.round(
            resample(col("supplier", "s_acctbal"), n_supp, jitter=10.0), 2),
    }))

    write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(1, n_part + 1), pa.int64()),
        "p_name": pa.array(resample(col("part", "p_name"), n_part)),
        "p_brand": pa.array(resample(col("part", "p_brand"), n_part)),
        "p_type": pa.array(resample(col("part", "p_type"), n_part)),
        "p_size": pa.array(resample(col("part", "p_size"), n_part), pa.int32()),
        "p_retailprice": np.round(
            resample(col("part", "p_retailprice"), n_part, jitter=1.0), 2),
    }))

    odate = resample(col("orders", "o_orderdate").astype("datetime64[us]")
                     .astype(np.int64), n_ord)
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord), pa.int64()),
        "o_orderstatus": pa.array(resample(col("orders", "o_orderstatus"), n_ord)),
        "o_totalprice": np.round(
            resample(col("orders", "o_totalprice"), n_ord, jitter=50.0), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            resample(col("orders", "o_orderpriority"), n_ord)),
    }))

    # lineitem: ~4 lines/order like the source; linenumber cycles within
    # the order so (orderkey, linenumber) has the source's dup structure
    lkey = np.sort(rng.integers(1, n_ord + 1, n_li))
    lnum = np.ones(n_li, np.int32)
    same = np.concatenate([[False], lkey[1:] == lkey[:-1]])
    run = np.ones(n_li, np.int64)
    for _ in range(8):  # prefix-scan the run length (max lines/order ~8)
        prev = np.concatenate([np.zeros(1, np.int64), run[:-1]])
        nrun = np.where(same, prev + 1, 1)
        if np.array_equal(nrun, run):
            break
        run = nrun
    lnum = run.astype(np.int32)
    sdate = resample(col("lineitem", "l_shipdate").astype("datetime64[us]")
                     .astype(np.int64), n_li)
    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_li), pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": resample(col("lineitem", "l_quantity"), n_li),
        "l_extendedprice": np.round(
            resample(col("lineitem", "l_extendedprice"), n_li, jitter=10.0), 2),
        "l_discount": np.round(resample(col("lineitem", "l_discount"), n_li), 2),
        "l_tax": np.round(resample(col("lineitem", "l_tax"), n_li), 2),
        "l_returnflag": pa.array(resample(col("lineitem", "l_returnflag"), n_li)),
        "l_linestatus": pa.array(resample(col("lineitem", "l_linestatus"), n_li)),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    ets = resample(col("events", "ts").astype("datetime64[us]")
                   .astype(np.int64), n_ev) \
        + rng.integers(0, 1000000, n_ev)
    write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(1, n_ev + 1), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, n_users + 1, n_ev), pa.int64()),
        "event_type": pa.array(resample(col("events", "event_type"), n_ev)),
        "value": np.round(np.abs(
            resample(col("events", "value"), n_ev, jitter=0.5)), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: random text from the source vocab at the source length
    # distribution; ~5% near-dup copies (10-20% words edited), ~0.2%
    # exact dups — matching sf0.1's 256 near-dup pairs / 8 exact per 5000
    vocab = duckdb.sql(
        "select distinct unnest(string_split(text,' ')) w "
        f"from '{SRC}/documents.parquet'").fetchnumpy()["w"]
    nw_dist = duckdb.sql(
        "select len(string_split(text,' ')) n "
        f"from '{SRC}/documents.parquet'").fetchnumpy()["n"]
    langs = col("documents", "lang")
    n_base = int(n_doc * 0.95)
    texts = []
    for i in range(n_base):
        nw = int(resample(nw_dist, 1)[0])
        texts.append(" ".join(rng.choice(vocab, nw)))
    while len(texts) < n_doc - 10:
        base = texts[int(rng.integers(0, n_base))].split(" ")
        k = max(1, int(len(base) * rng.uniform(0.1, 0.2)))
        idx = rng.choice(len(base), min(k, len(base)), replace=False)
        for j in idx:
            base[j] = str(rng.choice(vocab))
        texts.append(" ".join(base))
    while len(texts) < n_doc:
        texts.append(texts[int(rng.integers(0, n_base))])
    order = rng.permutation(n_doc)
    texts = [texts[i] for i in order]
    write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(resample(langs, n_doc)),
        "source": pa.array([f"src{int(s)}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: per-label centroid + residual noise fit from sf0.1;
    # ~5% planted near-dup vectors (tiny perturbations of earlier rows)
    src_emb = np.stack(duckdb.sql(
        f"select embedding from '{SRC}/embeddings.parquet'")
        .fetchnumpy()["embedding"])
    src_lab = col("embeddings", "label")
    cents = np.stack([src_emb[src_lab == l].mean(axis=0) for l in range(10)])
    resid = float(np.mean([src_emb[src_lab == l].std(axis=0).mean()
                           for l in range(10)]))
    labels = rng.integers(0, 10, n_vec)
    emb = cents[labels] + rng.normal(0, resid, (n_vec, src_emb.shape[1]))
    ndup = int(n_vec * 0.05)
    dup_src = rng.integers(0, n_vec - ndup, ndup)
    emb[n_vec - ndup:] = emb[dup_src] + rng.normal(0, 0.01 * resid,
                                                   (ndup, src_emb.shape[1]))
    labels[n_vec - ndup:] = labels[dup_src]
    write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array([v for v in emb.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1.0"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, scale)
    print(f"done -> {out} (scale {scale}x sf0.1)")
