#!/usr/bin/env python3
"""Independent CityHash64 v1.0.2 reference implementation (pure Python).

Written separately from the Scala implementation in
src/main/scala/graft/functions/CityHash64.scala, from the same published
algorithm (Google cityhash v1.0.2, MIT license — the revision ClickHouse
vendors as contrib/cityhash102). Used to generate the golden vectors in
CityHash64Spec: a translation bug in either implementation (endianness,
signed/unsigned arithmetic, rotation direction, length-branch boundaries)
makes the two disagree, so agreement across all length branches is strong
evidence both match the published algorithm.

Usage: python3 tools/cityhash_ref.py            # print spec vectors
       python3 tools/cityhash_ref.py <string>   # hash one string
"""
import sys

M = (1 << 64) - 1  # uint64 mask

K0 = 0xc3a5c85c97cb3127
K1 = 0xb492b66fbe98f273
K2 = 0x9ae16a3b2f90404f
K3 = 0xc949d7c7509e6557
KMUL = 0x9ddfea08eb382d69


def u64(x):
    return x & M


def fetch64(s, i):
    return int.from_bytes(s[i:i + 8], "little")


def fetch32(s, i):
    return int.from_bytes(s[i:i + 4], "little")


def rotr(v, shift):
    if shift == 0:
        return v
    return u64((v >> shift) | (v << (64 - shift)))


def shift_mix(v):
    return u64(v ^ (v >> 47))


def hash128to64(lo, hi):
    a = u64((lo ^ hi) * KMUL)
    a ^= a >> 47
    b = u64((hi ^ a) * KMUL)
    b ^= b >> 47
    return u64(b * KMUL)


def hash_len16(u, v):
    return hash128to64(u, v)


def hash_len_0to16(s):
    n = len(s)
    if n > 8:
        a = fetch64(s, 0)
        b = fetch64(s, n - 8)
        return u64(hash_len16(a, rotr(u64(b + n), n)) ^ b)
    if n >= 4:
        a = fetch32(s, 0)
        return hash_len16(u64(n + (a << 3)), fetch32(s, n - 4))
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = a + (b << 8)
        z = n + (c << 2)
        return u64(shift_mix(u64(y * K2) ^ u64(z * K3)) * K2)
    return K2


def hash_len_17to32(s):
    n = len(s)
    a = u64(fetch64(s, 0) * K1)
    b = fetch64(s, 8)
    c = u64(fetch64(s, n - 8) * K2)
    d = u64(fetch64(s, n - 16) * K0)
    return hash_len16(
        u64(rotr(u64(a - b), 43) + rotr(c, 30) + d),
        u64(a + rotr(b ^ K3, 20) - c + n))


def hash_len_33to64(s):
    n = len(s)
    z = fetch64(s, 24)
    a = u64(fetch64(s, 0) + u64((n + fetch64(s, n - 16)) * K0))
    b = rotr(u64(a + z), 52)
    c = rotr(a, 37)
    a = u64(a + fetch64(s, 8))
    c = u64(c + rotr(a, 7))
    a = u64(a + fetch64(s, 16))
    vf = u64(a + z)
    vs = u64(b + rotr(a, 31) + c)
    a = u64(fetch64(s, 16) + fetch64(s, n - 32))
    z = fetch64(s, n - 8)
    b = rotr(u64(a + z), 52)
    c = rotr(a, 37)
    a = u64(a + fetch64(s, n - 24))
    c = u64(c + rotr(a, 7))
    a = u64(a + fetch64(s, n - 16))
    wf = u64(a + z)
    ws = u64(b + rotr(a, 31) + c)
    r = shift_mix(u64(u64(vf + ws) * K2 + u64(wf + vs) * K0))
    return u64(shift_mix(u64(r * K0 + vs)) * K2)


def weak_hash32_seeds(w, x, y, z, a, b):
    a = u64(a + w)
    b = rotr(u64(b + a + z), 21)
    c = a
    a = u64(a + x + y)
    b = u64(b + rotr(a, 44))
    return u64(a + z), u64(b + c)


def weak_hash32(s, i, a, b):
    return weak_hash32_seeds(fetch64(s, i), fetch64(s, i + 8),
                             fetch64(s, i + 16), fetch64(s, i + 24), a, b)


def cityhash64(s):
    n = len(s)
    if n <= 16:
        return hash_len_0to16(s)
    if n <= 32:
        return hash_len_17to32(s)
    if n <= 64:
        return hash_len_33to64(s)
    x = fetch64(s, 0)
    y = fetch64(s, n - 16) ^ K1
    z = fetch64(s, n - 56) ^ K0
    v = weak_hash32(s, n - 64, n, y)
    w = weak_hash32(s, n - 32, u64(n * K1), K0)
    z = u64(z + shift_mix(v[1]) * K1)
    x = u64(rotr(u64(z + x), 39) * K1)
    y = u64(rotr(y, 33) * K1)
    remaining = (n - 1) & ~63
    p = 0
    while remaining != 0:
        x = u64(rotr(u64(x + y + v[0] + fetch64(s, p + 16)), 37) * K1)
        y = u64(rotr(u64(y + v[1] + fetch64(s, p + 48)), 42) * K1)
        x ^= w[1]
        y ^= v[0]
        z = rotr(z ^ w[0], 33)
        v = weak_hash32(s, p, u64(v[1] * K1), u64(x + w[0]))
        w = weak_hash32(s, p + 32, u64(z + w[1]), y)
        z, x = x, z
        p += 64
        remaining -= 64
    return hash_len16(
        u64(hash_len16(v[0], w[0]) + shift_mix(y) * K1 + z),
        u64(hash_len16(v[1], w[1]) + x))


def int_hash64(x):
    """ClickHouse intHash64 (Common/HashTable/Hash.h)."""
    x = u64(x)
    x ^= x >> 33
    x = u64(x * 0xff51afd7ed558ccd)
    x ^= x >> 33
    x = u64(x * 0xc4ceb9fe1a85ec53)
    x ^= x >> 33
    return x


def combine(h1, h2):
    """ClickHouse combineHashes for cityHash64."""
    return hash128to64(h1, h2)


def row_id(ts_us, name, keys, values, value_f64):
    """ClickHouse cityHash64(timestamp, name, labels.key, labels.value,
    value) per FunctionsHashing.h: intHash64 for PODs, CityHash64 for
    strings, arrays as intHash64(len) then elements, Hash128to64 chain."""
    import struct
    acc = int_hash64(ts_us)  # DateTime64(6) = Decimal64 → Int64 micros
    acc = combine(acc, cityhash64(name.encode()))
    for arr in (keys, values):
        acc = combine(acc, int_hash64(len(arr)))
        for el in arr:
            acc = combine(acc, cityhash64(el.encode()))
    bits = struct.unpack("<Q", struct.pack("<d", value_f64))[0]
    return combine(acc, int_hash64(bits))


SPEC_STRINGS = [
    b"",                       # len 0 → K2 identity
    b"a", b"ab", b"abc",       # 1-3: byte branch
    b"abcd", b"hash", b"graft!!",  # 4-8: fetch32 branch
    b"abcdefghi", b"0123456789abcdef",  # 9-16: fetch64 branch
    b"0123456789abcdefg",      # 17: HashLen17to32 lower edge
    b"Prometheus to ClickHouse ETL",   # 28
    b"0123456789abcdef0123456789abcdef",  # 32: upper edge
    b"0123456789abcdef0123456789abcdefX",  # 33: HashLen33to64 lower edge
    b"The quick brown fox jumps over the lazy dog and the cat too!",  # 61
    bytes(range(64)),          # 64: upper edge
    bytes(range(65)),          # 65: long-loop lower edge
    (b"etl-prometheus2clickhouse/" * 5),  # 130: two loop passes
    bytes((i * 131 + 17) % 256 for i in range(256)),  # 256: four passes
]

if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(cityhash64(sys.argv[1].encode()))
    else:
        for s in SPEC_STRINGS:
            print(f"{len(s):4d}  {cityhash64(s):>20d}  {s[:32]!r}")
        # composite row-id vectors (ts_us, name, keys, values, value)
        rows = [
            (1705320000000000, "http_requests_total",
             ["instance", "job"], ["localhost:9090", "prometheus"], 1027.0),
            (1705320060123456, "node_cpu_seconds_total",
             ["cpu", "instance", "mode"], ["0", "n1", "idle"], 0.25),
            (0, "up", [], [], float("nan")),
            (1705320000000001, "metric", ["k"], ["v"], -0.0),
        ]
        for r in rows:
            print("row_id", row_id(*r))
