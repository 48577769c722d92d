"""Content-defined chunking (operators/cdc.py)."""

import hashlib

import numpy as np
import pytest

from autoextract.operators.cdc import (
    _GEAR,
    blob_chunks,
    gear_chunks,
    gear_hashes,
)


def _blob(seed, n=32768):
    return np.random.RandomState(seed).bytes(n)


def test_gear_hash_matches_naive_recurrence():
    data = _blob(1, 500)
    h = 0
    expected = []
    for b in data:
        h = ((h << 1) + int(_GEAR[b])) & (2**64 - 1)
        expected.append(h)
    assert gear_hashes(data).tolist() == expected


def test_chunks_partition_blob_and_respect_bounds():
    data = _blob(2)
    chunks = gear_chunks(data, avg_bits=10, min_size=256, max_size=4096)
    assert chunks[0][0] == 0
    for (o1, l1), (o2, _) in zip(chunks, chunks[1:]):
        assert o1 + l1 == o2
    assert sum(l for _, l in chunks) == len(data)
    for _, ln in chunks[:-1]:
        assert 256 <= ln <= 4096
    assert chunks[-1][1] <= 4096


def test_boundaries_realign_after_prefix_insertion():
    a = _blob(3)
    b = _blob(99, 137) + a  # 137 junk bytes prepended
    sha = lambda d, c: {hashlib.sha256(d[o : o + l]).digest() for o, l in c}
    ca = gear_chunks(a, avg_bits=10, min_size=256, max_size=4096)
    cb = gear_chunks(b, avg_bits=10, min_size=256, max_size=4096)
    shared = sha(a, ca) & sha(b, cb)
    assert len(shared) >= 0.7 * len(ca)


def test_empty_and_bad_args():
    assert gear_chunks(b"") == []
    with pytest.raises(ValueError):
        gear_chunks(b"x", avg_bits=0)
    with pytest.raises(ValueError):
        gear_chunks(b"x", min_size=10, max_size=5)


def test_blob_chunks_spark_partition_invariant(spark):
    rows = [(str(i), _blob(i, 16384)) for i in range(6)] + [("null", None)]
    df = spark.createDataFrame(rows, "blob_id string, payload binary")
    kw = dict(avg_bits=10, min_size=256, max_size=4096)
    one = blob_chunks(df.coalesce(1), **kw).collect()
    many = blob_chunks(df.repartition(5), **kw).collect()
    key = lambda r: (r.blob_id, r.ord)
    assert sorted(one, key=key) == sorted(many, key=key)
    # rehydration invariant: offsets/lengths partition each blob
    by_blob = {}
    for r in one:
        by_blob.setdefault(r.blob_id, []).append(r)
    assert "null" not in by_blob
    for bid, rs in by_blob.items():
        rs.sort(key=lambda r: r.ord)
        pos = 0
        for r in rs:
            assert r.offset == pos
            pos += r.length
        assert pos == 16384
        # chunk hashes match a direct rehash of the source spans
        src = dict(rows)[bid]
        for r in rs:
            assert (
                hashlib.sha256(src[r.offset : r.offset + r.length]).hexdigest()
                == r.chunk_sha
            )
