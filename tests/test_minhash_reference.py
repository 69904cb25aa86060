"""Deterministic pure-Python oracle for the MinHash+LSH and SimHash
operators (the two driver queries that are rows-only / no_oracle because
they are not SQL-expressible in DuckDB).

Replicates Spark's XxHash64 expression bit-for-bit (XXH64 with seed 42,
multi-argument chaining: each value hashed with the running hash as seed,
strings as UTF-8 bytes, int32 literals via the 4-byte tail path), then the
whole pipeline — normalize -> tokenize -> k-shingles -> per-shingle hash
lanes -> min -> banded bucket hash -> per-bucket pairs — in plain Python,
and asserts the Spark operators reproduce it exactly on a fixed corpus.
"""

from __future__ import annotations

import pytest

from gojsonschema_spark.ops import dedup as dd

pytestmark = pytest.mark.spark

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (Spark XXH64.hashUnsafeBytes)."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i + 32 <= length:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (_rotl((v + k * P2) & M64, 31) * P1) & M64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + length) & M64
    while i + 8 <= length:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= length:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < length:
        h ^= (data[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt (4-byte path, int32 literal arguments)."""
    h = (seed + P5 + 4) & M64
    h ^= ((value & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong (8-byte path, LongType arguments)."""
    h = (seed + P5 + 8) & M64
    k = (_rotl(((value & M64) * P2) & M64, 31) * P1) & M64
    h ^= k
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*args, seed: int = 42) -> int:
    """F.xxhash64(...) chaining: running hash seeds the next value.
    Ints are hashed via the 4-byte path (IntegerType literals); wrap a
    value in Long() for the 8-byte LongType path."""
    h = seed
    for a in args:
        if isinstance(a, str):
            h = xxh64_bytes(a.encode("utf-8"), h)
        elif isinstance(a, Long):
            h = xxh64_long(a.v, h)
        else:
            h = xxh64_int(a, h)
    return _signed(h)


class Long:
    """Marker for 8-byte (LongType) xxhash64 arguments."""
    __slots__ = ("v",)

    def __init__(self, v: int):
        self.v = v


# --- pure-Python replica of the operator pipeline ---------------------------

def py_shingles(text: str, k: int = 3) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    norm = " ".join(toks)  # normalize_text == trim + collapse whitespace
    toks = norm.split(" ") if norm else [""]
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def py_signature(text: str, num_hashes: int, k: int = 3) -> list[int]:
    # pipeline since r3: one string hash per shingle, lanes re-hash the
    # long (mirrors minhash_signatures' explode(transform(.., xxhash64)))
    h0s = [spark_xxhash64(s) for s in py_shingles(text, k)]
    return [min(spark_xxhash64(Long(h0), i) for h0 in h0s)
            for i in range(num_hashes)]


def py_lsh_pairs(docs: dict[int, str], num_hashes: int, bands: int,
                 k: int = 3, max_bucket: int = 1000) -> set[tuple[int, int]]:
    rows_per_band = num_hashes // bands
    sigs = {d: py_signature(t, num_hashes, k) for d, t in docs.items()}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, sig in sigs.items():
        for b in range(bands):
            chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
            bucket = spark_xxhash64(",".join(str(x) for x in chunk))
            buckets.setdefault((b, bucket), []).append(d)
    pairs = set()
    for ks in buckets.values():
        if 2 <= len(ks) <= max_bucket:
            ks = sorted(ks)
            for i in range(len(ks)):
                for j in range(i + 1, len(ks)):
                    pairs.add((ks[i], ks[j]))
    return pairs


def py_simhash(text: str, bits: int) -> int:
    toks = [t for t in " ".join(text.lower().split()).split(" ") if t != ""] \
        if text.strip() else []
    hashes = [_signed(xxh64_bytes(t.encode(), 42)) for t in toks]
    out = 0
    for b in range(bits):
        mask = (1 << b) if b < 63 else -(1 << 63)
        vote = sum(1 if (h & mask) else -1 for h in hashes)
        if vote > 0:
            out += mask
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog again and again",
    2: "the quick brown fox jumps over the lazy dog again and again",
    3: "the quick brown fox jumps over the lazy dog again and AGAIN",
    4: "completely different words occupy this document body right here",
    5: "spark graft validation engine compiles schemas to column plans",
    6: "spark graft validation engine compiles schemas into column plans",
    7: "short doc",
    8: "short doc",
    9: "",
    10: "one two three four five six seven eight nine ten eleven twelve",
}


def test_spark_xxhash64_replica(spark):
    """The pure-Python XXH64 matches F.xxhash64 on strings of every tail
    length class (0-40 bytes) and on chained (string, int) arguments."""
    from pyspark.sql import functions as F
    strs = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
            "abcdefghi", "0123456789abcdef", "0123456789abcdef0123456789abc",
            "x" * 32, "x" * 33, "y" * 40, "the quick brown fox", "naïve ünïcode"]
    df = spark.createDataFrame([(s, i % 7) for i, s in enumerate(strs)],
                               ["s", "i"])
    got = df.select(F.xxhash64("s").alias("h1"),
                    F.xxhash64("s", "i").alias("h2")).collect()
    for (s, i), r in zip([(s, i % 7) for i, s in enumerate(strs)], got):
        assert r.h1 == spark_xxhash64(s), f"plain hash diverged on {s!r}"
        # column i is int64 in createDataFrame -> use the long path? No:
        # createDataFrame infers LongType; xxhash64 hashes it as long.
        # Compare via the long variant below.
    # int literal (IntegerType) chaining
    got2 = df.select(F.xxhash64("s", F.lit(3)).alias("h")).collect()
    for s, r in zip(strs, got2):
        assert r.h == spark_xxhash64(s, 3), f"chained hash diverged on {s!r}"


def test_minhash_lsh_pairs_match_python_reference(spark):
    df = spark.createDataFrame(list(CORPUS.items()), ["doc_id", "text"])
    for num_hashes, bands in ((32, 8), (64, 16)):
        got = {(r.key_a, r.key_b) for r in
               dd.minhash_lsh_pairs(df, num_hashes=num_hashes,
                                    bands=bands).collect()}
        want = py_lsh_pairs(CORPUS, num_hashes, bands)
        assert got == want, (f"LSH pairs diverged at {num_hashes}/{bands}: "
                             f"extra={got - want} missing={want - got}")
        assert (1, 2) in got and (7, 8) in got  # identical docs collide


def test_minhash_signatures_match_python_reference(spark):
    df = spark.createDataFrame(list(CORPUS.items()), ["doc_id", "text"])
    rows = dd.minhash_signatures(df, num_hashes=16).collect()
    got = {r.k: [r[f"h{i}"] for i in range(16)] for r in rows}
    for d, text in CORPUS.items():
        assert got[d] == py_signature(text, 16), f"signature diverged doc {d}"


def test_simhash_matches_python_reference(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(list(CORPUS.items()), ["doc_id", "text"])
    rows = df.select("doc_id",
                     dd.simhash(F.col("text"), bits=16).alias("sh")).collect()
    for r in rows:
        assert r.sh == py_simhash(CORPUS[r.doc_id], 16), \
            f"simhash diverged doc {r.doc_id}"
