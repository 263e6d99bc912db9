"""Generate independent expected-result fixtures for the two xxhash64-based
driver queries (`minhash_lsh_dedup`, `simhash_fingerprint`).

DuckDB has no Spark-compatible xxhash64, so these queries cannot be
expressed as plain oracle SQL.  Instead this script *re-derives the
expected output in pure Python/numpy* — using `tools/pyxxh64.py`, an
independent implementation of the public XXH64 spec (cross-checked
bit-for-bit against Spark in tests/test_hash_oracle.py) — and writes it
to parquet.  The oracle SQL then just reads the fixture:

    SELECT doc_id, ... FROM read_parquet('/root/repo/fixtures/<q>/*.parquet')
    WHERE corpus_key = (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents)

`corpus_key` (total characters in the corpus) disambiguates scale
factors, so one glob works at sf0.001 / sf0.01 / sf0.1.

The replication here is intentionally NOT the Spark code path: plain
Python string ops + dict/set logic + numpy, mirroring the *semantics*
documented in circus_train_spark/pipeline/dedup.py:

- normalize  = lower(trim(text)) with runs of whitespace collapsed
- shingles   = distinct word 3-grams (whole text if < 3 words)
- minhash_i  = min over shingles of xxh64_int(i, seed=xxh64(shingle))
- LSH        = 4 bands × 4 rows, bucket = xxh64(csv of band slice),
               buckets > 1000 dropped, pairs verified by exact Jaccard ≥ 0.8,
               higher doc_id of each matched pair removed
- simhash    = 64-bit majority vote over per-word xxh64 bits (ties → 1)

Usage: python tools/make_hash_fixtures.py [testdata_root] [out_root]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyxxh64 import _signed, xxh64_bytes  # noqa: E402

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

# entry-layer minhash config (the library default stays 32/8; the driver
# query runs 16 families x 4 bands — same rows-per-band r=4, so the same
# S-curve steepness at half the signature CPU; see __spark_entry__
# q_minhash_lsh_dedup)
NUM_HASHES = 16
BANDS = 4
SHINGLE_N = 3
MAX_BUCKET = 1000
THRESHOLD = 0.8
ID_SHIFT = 1_000_000

_ws = re.compile(r"\s+")


def normalize(text: str) -> str:
    return _ws.sub(" ", text.strip(" ").lower())


def shingles(text: str, n: int = SHINGLE_N) -> list[str]:
    norm = normalize(text)
    words = norm.split(" ")
    k = len(words) - (n - 1)
    if k > 0:
        return list(dict.fromkeys(" ".join(words[i : i + n]) for i in range(k)))
    return [norm]


def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix_v(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_int_v(value: int, seeds: np.ndarray) -> np.ndarray:
    """Vectorized 4-byte-path XXH64: one int hashed under many seeds."""
    h = seeds + (_P5 + np.uint64(4))
    mixed = ((value & 0xFFFFFFFF) * 0x9E3779B185EBCA87) & ((1 << 64) - 1)
    h = h ^ np.uint64(mixed)
    h = _rotl_v(h, 23) * _P2 + _P3
    return _fmix_v(h)


def minhash_matrix(texts: list[str]) -> tuple[list[list[int]], list[set[str]]]:
    """Per-doc (NUM_HASHES-long signature, distinct-shingle set).

    String hashing is cached per distinct shingle; the chained family
    hashes are one vectorized numpy pass per shingle.
    """
    shingle_sets = [shingles(t) for t in texts]
    vocab: dict[str, int] = {}
    for ss in shingle_sets:
        for s in ss:
            if s not in vocab:
                vocab[s] = len(vocab)
    seeds = np.fromiter(
        (xxh64_bytes(s.encode("utf-8")) for s in vocab),
        dtype=np.uint64,
        count=len(vocab),
    )
    # H[j, i] = signed chain hash of family i for shingle j
    H = np.empty((len(vocab), NUM_HASHES), dtype=np.uint64)
    for i in range(NUM_HASHES):
        H[:, i] = xxh64_int_v(i, seeds)
    H = H.view(np.int64)
    sigs = []
    for ss in shingle_sets:
        idx = np.fromiter((vocab[s] for s in ss), dtype=np.int64, count=len(ss))
        sigs.append(H[idx].min(axis=0).tolist())
    return sigs, [set(ss) for ss in shingle_sets]


def minhash_dedup_expected(docs: pd.DataFrame) -> pd.DataFrame:
    """Survivors of minhash_dedup over the doubled corpus (doc_id, source)."""
    doubled = pd.concat(
        [docs, docs.assign(doc_id=docs.doc_id + ID_SHIFT)], ignore_index=True
    )
    ids = doubled.doc_id.tolist()
    sigs, sets_ = minhash_matrix(doubled.text.tolist())

    r = NUM_HASHES // BANDS
    buckets: dict[tuple[int, int], list[int]] = {}
    for row, sig in enumerate(sigs):
        for b in range(BANDS):
            key_str = ",".join(str(sig[b * r + j]) for j in range(r))
            bucket = _signed(xxh64_bytes(key_str.encode("utf-8")))
            buckets.setdefault((b, bucket), []).append(row)

    pairs: set[tuple[int, int]] = set()
    for rows in buckets.values():
        if len(rows) > MAX_BUCKET:
            continue
        by_id = sorted(rows, key=lambda i: ids[i])
        for x in range(len(by_id)):
            for y in range(x + 1, len(by_id)):
                a, b = by_id[x], by_id[y]
                if ids[a] != ids[b]:
                    pairs.add((a, b) if ids[a] < ids[b] else (b, a))

    dropped: set[int] = set()
    for a, b in pairs:
        inter = len(sets_[a] & sets_[b])
        union = len(sets_[a] | sets_[b])
        if inter / max(union, 1) >= THRESHOLD:
            dropped.add(ids[b])

    keep = doubled[~doubled.doc_id.isin(dropped)]
    return keep[["doc_id", "source"]].reset_index(drop=True)


def simhash_expected(docs: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, simhash) — majority-vote fingerprint over per-word hashes."""
    word_cache: dict[str, int] = {}
    out = np.empty(len(docs), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for row, text in enumerate(docs.text.tolist()):
        words = normalize(text).split(" ")
        hs = np.empty(len(words), dtype=np.uint64)
        for j, w in enumerate(words):
            h = word_cache.get(w)
            if h is None:
                h = word_cache[w] = xxh64_bytes(w.encode("utf-8"))
            hs[j] = h
        bits = (hs[:, None] >> bit_idx) & one
        counts = bits.sum(axis=0)
        fp = (counts * 2 >= len(words)).astype(np.uint64)
        out[row] = np.bitwise_or.reduce(fp << bit_idx)
    return pd.DataFrame(
        {"doc_id": docs.doc_id.to_numpy(), "simhash": out.view(np.int64)}
    )


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    out_root = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    )
    for sf in sorted(os.listdir(root)):
        path = os.path.join(root, sf, "documents.parquet")
        if not os.path.exists(path):
            continue
        docs = pq.read_table(path, columns=["doc_id", "text", "source", "n_chars"]).to_pandas()
        key = int(docs.n_chars.sum())

        mh = minhash_dedup_expected(docs)
        mh["corpus_key"] = np.int64(key)
        d1 = os.path.join(out_root, "minhash_lsh_dedup")
        os.makedirs(d1, exist_ok=True)
        mh.to_parquet(os.path.join(d1, f"{sf}.parquet"), index=False)

        sh = simhash_expected(docs)
        sh["corpus_key"] = np.int64(key)
        d2 = os.path.join(out_root, "simhash_fingerprint")
        os.makedirs(d2, exist_ok=True)
        sh.to_parquet(os.path.join(d2, f"{sf}.parquet"), index=False)

        print(f"{sf}: corpus_key={key} minhash_survivors={len(mh)} simhash_rows={len(sh)}")


if __name__ == "__main__":
    main()
