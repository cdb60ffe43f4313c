#!/usr/bin/env python3
"""DOCUMENTS-ONLY scratch fixture for the third-decade probe
(VERDICT_r10 item 6): the corpus-token-linear text families and the
dedup saturation routing are documents-bound, so probing them at sf100
needs 5M docs (~10 GB of text) but none of the other tables. Same
construction as gen_sf.py's documents table (vocab/length bootstrap
from sf0.1, ~5% near-dup edited copies, a handful of exact dups),
generated in CHUNKS through one ParquetWriter so the 5M-row build
stays inside a few GB of RAM.

Usage: python3 tools/gen_docs_sf.py /tmp/graft_sf100_docs 1000
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(7)
CHUNK = 100000


def main(outdir, scale):
    os.makedirs(outdir, exist_ok=True)
    n_doc = 5000 * scale

    vocab = duckdb.sql(
        "select distinct unnest(string_split(text,' ')) w "
        f"from '{SRC}/documents.parquet'").fetchnumpy()["w"]
    nw_dist = duckdb.sql(
        "select len(string_split(text,' ')) n "
        f"from '{SRC}/documents.parquet'").fetchnumpy()["n"].astype(np.int64)
    langs = duckdb.sql(
        f"select lang from '{SRC}/documents.parquet'").fetchnumpy()["lang"]

    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string()), ("source", pa.string()),
        ("n_chars", pa.int64())])
    writer = pq.ParquetWriter(os.path.join(outdir, "documents.parquet"),
                              schema)
    written = 0
    while written < n_doc:
        n = min(CHUNK, n_doc - written)
        nws = rng.choice(nw_dist, n)
        # vectorized text build: one flat word-index draw per chunk
        flat = rng.integers(0, len(vocab), int(nws.sum()))
        words = vocab[flat]
        offs = np.concatenate([[0], np.cumsum(nws)])
        texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n)]
        # ~5% near-dup edited copies + ~0.2% exact dups WITHIN the
        # chunk (the dedup probe needs the planted structure to exist,
        # not to span chunks)
        ndup = int(n * 0.05)
        for j in range(ndup):
            src = texts[int(rng.integers(0, n - ndup))].split(" ")
            k = max(1, int(len(src) * rng.uniform(0.1, 0.2)))
            for i in rng.choice(len(src), min(k, len(src)), replace=False):
                src[i] = str(rng.choice(vocab))
            texts[n - ndup + j] = " ".join(src)
        for j in range(max(1, n // 500)):
            texts[int(rng.integers(0, n))] = \
                texts[int(rng.integers(0, n))]
        writer.write_table(pa.table({
            "doc_id": pa.array(
                np.arange(written, written + n), pa.int64()),
            "text": texts,
            "lang": pa.array(rng.choice(langs, n)),
            "source": pa.array(
                [f"src{int(s)}" for s in rng.integers(0, 20, n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }, schema=schema))
        written += n
        print(f"  documents: {written}/{n_doc}", flush=True)
    writer.close()
    print(f"done -> {outdir} (documents-only, scale {scale}x sf0.1)")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
