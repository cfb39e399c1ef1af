#!/usr/bin/env python3
"""Generate data/hash_expected.parquet — the committed-constants oracle
for the trino_hash_duration catalog row (same discipline as
gen_stat_expected.py): expected values derived INDEPENDENTLY of the
engine, in pure Python, for functions DuckDB lacks.

- murmur3: canonical MurmurHash3 x86_32 (Austin Appleby's public
  domain algorithm), seed 0, over UTF-8 bytes. The reference engine
  declares MURMUR3 -> Int32 (logical_expr.rs:450) but errors
  NotImplemented (filter.rs:4529); graft implements it.
- parse_duration: Trino's duration grammar (decimal value + unit
  ns|us|ms|s|m|h|d), here reduced to whole seconds (the catalog row
  casts the day-time interval to BIGINT seconds; sub-second precision
  is pinned in FunctionValuesSpec instead).

Inputs are constants derived from doc_id (0..24), not document text,
so the fixture survives testdata regeneration.
"""
import duckdb

M32 = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & M32
    n = len(data)

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M32

    for i in range(n // 4):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = (k * c1) & M32
        k = rotl(k, 15)
        k = (k * c2) & M32
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & M32
    tail = data[(n // 4) * 4:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & M32
        k = rotl(k, 15)
        k = (k * c2) & M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


# published verification vectors for MurmurHash3 x86_32 seed 0
assert murmur3_x86_32(b"") == 0
assert murmur3_x86_32(b"hello") == 0x248BFA47
assert (murmur3_x86_32(b"The quick brown fox jumps over the lazy dog")
        == 0x2E4FF723)

UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def duration_seconds(text: str) -> int:
    num, unit = text[:-1], text[-1]
    val = float(num) * UNIT_SECONDS[unit]
    assert val == int(val), f"fixture durations must be whole seconds: {text}"
    return int(val)


BASE = "The quick brown fox jumps over the lazy dog. " * 10
# lengths cover every mod-4 tail class, the empty string, and block
# boundaries up to 441 bytes
LENGTHS = [0, 1, 2, 3, 4, 5, 7, 8, 11, 15, 16, 23, 31, 32, 45, 63, 64,
           95, 127, 128, 191, 192, 255, 320, 441]
DURATIONS = ["90s", "5m", "1.5h", "2d", "36h", "45s", "720m", "3h",
             "1d", "0s", "600s", "2.5m", "12h", "7d", "30s", "15m",
             "0.5h", "4d", "100s", "25m", "6h", "10d", "1s", "59m",
             "23h"]

rows = []
for i in range(25):
    s = BASE[:LENGTHS[i]]
    rows.append((i, LENGTHS[i], murmur3_x86_32(s.encode()),
                 DURATIONS[i], duration_seconds(DURATIONS[i])))

con = duckdb.connect()
con.execute("""
  CREATE TABLE t (doc_id BIGINT, slen INTEGER, mm3 INTEGER,
                  dur VARCHAR, dur_sec BIGINT)""")
con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
con.execute("COPY t TO '/root/repo/data/hash_expected.parquet' (FORMAT PARQUET)")
print(con.sql("SELECT * FROM t LIMIT 5").fetchall())
print("wrote /root/repo/data/hash_expected.parquet")
