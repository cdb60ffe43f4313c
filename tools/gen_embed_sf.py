#!/usr/bin/env python3
"""EMBEDDINGS-ONLY scratch fixture for the third-decade similarity
probe (VERDICT_r12 item 1): the r12 adaptive-planes fix and the r7 ivfK
law are measured only at sf10; probing the embedding family at sf100
needs 2M vectors (1000x the sf0.1 table) but none of the other tables.
Same construction as gen_sf.py's embeddings table (per-label centroid +
residual noise fit from sf0.1, ~5% planted near-dup vectors as tiny
perturbations of earlier rows in the same chunk), generated in CHUNKS
through one ParquetWriter so the build stays inside a few GB of RAM.

Usage: python3 tools/gen_embed_sf.py /tmp/graft_sf100_embed 1000
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(13)
CHUNK = 100000


def main(outdir, scale):
    os.makedirs(outdir, exist_ok=True)
    n_vec = 2000 * scale

    src_emb = np.stack(duckdb.sql(
        f"select embedding from '{SRC}/embeddings.parquet'")
        .fetchnumpy()["embedding"])
    src_lab = duckdb.sql(
        f"select label from '{SRC}/embeddings.parquet'")\
        .fetchnumpy()["label"]
    cents = np.stack([src_emb[src_lab == l].mean(axis=0)
                      for l in range(10)])
    resid = float(np.mean([src_emb[src_lab == l].std(axis=0).mean()
                           for l in range(10)]))
    dim = src_emb.shape[1]

    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32())])
    writer = pq.ParquetWriter(
        os.path.join(outdir, "embeddings.parquet"), schema)
    written = 0
    while written < n_vec:
        n = min(CHUNK, n_vec - written)
        labels = rng.integers(0, 10, n)
        emb = cents[labels] + rng.normal(0, resid, (n, dim))
        # ~5% planted near-dups WITHIN the chunk (the dedup probes need
        # the structure to exist, not to span chunks)
        ndup = int(n * 0.05)
        if ndup:
            dup_src = rng.integers(0, n - ndup, ndup)
            emb[n - ndup:] = emb[dup_src] + rng.normal(
                0, 0.01 * resid, (ndup, dim))
            labels[n - ndup:] = labels[dup_src]
        writer.write_table(pa.table({
            "vec_id": pa.array(np.arange(written, written + n), pa.int64()),
            "embedding": pa.array([v for v in emb.astype(np.float32)],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }, schema=schema))
        written += n
        print(f"  embeddings: {written}/{n_vec}", flush=True)
    writer.close()
    print(f"done -> {outdir} (embeddings-only, scale {scale}x sf0.1)")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100_embed"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(out, scale)
