"""Degenerate-media guards for the shared fingerprint machinery
(ops/fingerprint — round-9 bucket-cap fix, VERDICT r8 What's-wrong #2):
identical fingerprints collapse before banding, hot band buckets are
capped, and the streaming flag form stays linear on boilerplate
corpora while agreeing with the pair op."""

from __future__ import annotations

from pyspark.sql import functions as F

from hops_spark.ops.fingerprint import fingerprint_dup_ids, fingerprint_pairs

SCHEMA = "media_id long, hi long, lo long"


def _fp(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _planted(spark, n_black=40, n_hot=30):
    """Planted construction:
    - ids 0..n_black-1: IDENTICAL 'black frame' fingerprints (the
      boilerplate group — one distinct fingerprint, B members);
    - ids 1000/1001: a near pair, hamming 2, agreeing on 3 of 4 bands;
    - ids 2000..2000+n_hot-1: DISTINCT fingerprints all sharing band 0
      (hi div 65536) but with unique other bands — the hot band value;
      2000 and 2001 additionally sit within hamming<=8 of each other
      while agreeing ONLY on the hot band 0.
    """
    rows = [(i, 0x12345678, 0x0A0B0C0D) for i in range(n_black)]
    rows.append((1000, 0x7EAD0001, 0x55AA55AA))
    rows.append((1001, 0x7EAD0002, 0x55AA55AB))
    # band0 (hi div 2^16) identical 0x7EAD; band1 (hi % 2^16) 0x0001 vs
    # 0x0002 = 2 bits; band2 (lo div 2^16) identical 0x55AA; band3
    # 0x55AA vs 0x55AB = 1 bit -> hamming 3, found via bands 0 and 2.
    base_lo = 0x11112222
    for k in range(n_hot):
        # band0 fixed at 0xBEEF (hot); band1 = 2*k avoids hamming<=8
        # neighbours except the planted 2000/2001 pair
        hi = (0xBEEF << 16) | (0x100 + 257 * k)
        lo = base_lo + (k << 20)
        rows.append((2000 + k, hi, lo))
    # make 2000/2001 a near pair that agrees ONLY on the hot band:
    rows = [r for r in rows if r[0] not in (2000, 2001)]
    rows.append((2000, (0xBEEF << 16) | 0x0F0F, 0x0001000A))
    rows.append((2001, (0xBEEF << 16) | 0x0F0E, 0x0101000B))
    # bands: 0 identical (hot); band1 differs 1 bit; band2 (lo div 2^16)
    # 0x0001 vs 0x0101 differ 1 bit; band3 0x000A vs 0x000B differ 1 bit
    # -> hamming 3, shared band ONLY band 0.
    return _fp(spark, rows)


def test_identical_group_pairs_and_near_pair(spark):
    df = _planted(spark)
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in fingerprint_pairs(df, threshold=8).collect()}
    # black-frame group: all C(40,2) pairs at hamming 0, via the
    # collapse (never the band join)
    assert sum(1 for (a, b) in pairs if a < 40 and b < 40) == 40 * 39 // 2
    assert pairs[(0, 1)] == 0
    # planted near pair found through its shared non-hot bands
    assert pairs[(1000, 1001)] == 3
    # hot-band-only pair found while the bucket is under the cap
    assert (2000, 2001) in pairs


def test_hot_band_bucket_cap_drops_only_that_band(spark):
    df = _planted(spark, n_hot=30)
    pairs = {(r.id_a, r.id_b)
             for r in fingerprint_pairs(df, threshold=8,
                                        max_bucket=10).collect()}
    # 30 distinct fingerprints share hot band 0 > max_bucket=10: the
    # 2000/2001 pair agreed ONLY on that band -> dropped (documented
    # approximation, exactly minhash/simhash cap semantics)
    assert (2000, 2001) not in pairs
    # pairs that agree on sub-cap bands are untouched by the hot band
    assert (1000, 1001) in pairs
    # identical-group pairs never route through bands: all still there
    assert sum(1 for (a, b) in pairs if a < 40 and b < 40) == 40 * 39 // 2


def test_dup_ids_agree_with_pairs_symmetric(spark):
    df = _planted(spark)
    pairs = fingerprint_pairs(df, threshold=8).collect()
    want = {r.id_b for r in pairs}  # id_b = greater = "has a lower dup"
    got = {r.media_id for r in fingerprint_dup_ids(df, threshold=8).collect()}
    assert got == want
    # linear on the boilerplate group: 39 flags from 40 black frames
    assert sum(1 for i in got if i < 40) == 39


def test_dup_ids_agree_with_pairs_asymmetric(spark):
    new = _planted(spark, n_black=5, n_hot=8)
    store = _fp(spark, [
        (9000, 0x12345678, 0x0A0B0C0D),        # exact match of the black fp
        (9001, 0x7EAD0001, 0x55AA55AA),        # exact match of id 1000
        (9002, (0xBEEF << 16) | 0x0F0F, 0x0001000B),  # hamming 1 off id 2000
    ])
    pairs = fingerprint_pairs(new, store, threshold=8).collect()
    want = {r.id_a for r in pairs}
    got = {r.media_id
           for r in fingerprint_dup_ids(new, store, threshold=8).collect()}
    assert got == want
    assert {i for i in got if i < 5} == {0, 1, 2, 3, 4}  # whole black group
    assert 1000 in got and 2000 in got


def test_asymmetric_store_side_cap(spark):
    # store: 20 distinct fingerprints sharing band 0 (the hot value);
    # new: one item at hamming 3 from store id 100, agreeing with it
    # ONLY on the hot band (bands 1-3 each differ by one bit) and
    # sharing no band with any other store member
    store_rows = [(100, (0xBEEF << 16) | 0x0101, 0xABC00003)]
    store_rows += [(100 + k, (0xBEEF << 16) | (0x200 + 257 * k),
                    0x50000000 + (k << 20)) for k in range(1, 20)]
    store = _fp(spark, store_rows)
    new = _fp(spark, [(1, (0xBEEF << 16) | 0x0100, 0xABC10001)])
    # uncapped: found (hamming 3 vs store id 100, via the hot band)
    assert fingerprint_pairs(new, store, threshold=8).count() == 1
    # capped below 20: the hot store band is dropped -> no candidates
    assert fingerprint_pairs(new, store, threshold=8,
                             max_bucket=8).count() == 0
    assert fingerprint_dup_ids(new, store, threshold=8,
                               max_bucket=8).count() == 0
