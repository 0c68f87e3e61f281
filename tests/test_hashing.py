"""Hash-family parity against the REAL Hadoop classes on the Spark JVM
classpath: MurmurHash/JenkinsHash property parity on arbitrary bytes,
and bloom-bit parity — the grid our hash_function_offsets implies must
agree with org.apache.hadoop.util.bloom.BloomFilter's membershipTest
on members AND non-members."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hops_spark.ops.hashing import (JENKINS, MURMUR, hash_function_offsets,
                                    jenkins_hash, murmur_hash)

SET = settings(max_examples=40, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])


def _jvm(spark):
    return spark._jvm


@SET
@given(data=st.binary(max_size=40),
       seed=st.integers(-(1 << 31), (1 << 31) - 1))
def test_murmur_matches_hadoop(spark, data, seed):
    mm = _jvm(spark).org.apache.hadoop.util.hash.MurmurHash.getInstance()
    assert murmur_hash(data, seed) == mm.hash(bytearray(data), len(data), seed)


@SET
@given(data=st.binary(max_size=40),
       seed=st.integers(0, (1 << 31) - 1))
def test_jenkins_matches_hadoop(spark, data, seed):
    jh = _jvm(spark).org.apache.hadoop.util.hash.JenkinsHash.getInstance()
    assert jenkins_hash(data, seed) == jh.hash(bytearray(data), len(data), seed)


@SET
@given(data=st.binary(min_size=1, max_size=24),
       nb=st.integers(1, 5), m=st.sampled_from([64, 997, 4096]),
       ht=st.sampled_from([MURMUR, JENKINS]))
def test_hash_function_offsets_match_hadoop(spark, data, nb, m, ht):
    jvm = _jvm(spark)
    hash_type = 1 if ht == MURMUR else 0     # Hash.MURMUR_HASH / JENKINS_HASH
    hf = jvm.org.apache.hadoop.util.bloom.HashFunction(m, nb, hash_type)
    want = list(hf.hash(jvm.org.apache.hadoop.util.bloom.Key(bytearray(data))))
    assert hash_function_offsets(data, m, nb, ht) == want


def test_bloom_bits_match_real_hadoop_bloomfilter(spark):
    """Insert 200 keys into the REAL BloomFilter and into our offset
    model; membership must agree exactly on all members and a 200-key
    non-member panel (including whatever false positives the filter
    produces — parity means agreeing on those too)."""
    jvm = _jvm(spark)
    m, nb = 1024, 3
    for ht_name, ht_const in ((MURMUR, 1), (JENKINS, 0)):
        bf = jvm.org.apache.hadoop.util.bloom.BloomFilter(m, nb, ht_const)
        members = [f"key-{i}".encode() for i in range(200)]
        ghosts = [f"ghost-{i}".encode() for i in range(200)]
        bits = set()
        for kb in members:
            bf.add(jvm.org.apache.hadoop.util.bloom.Key(bytearray(kb)))
            bits.update(hash_function_offsets(kb, m, nb, ht_name))
        for kb in members + ghosts:
            ours = all(p in bits for p in hash_function_offsets(kb, m, nb, ht_name))
            theirs = bf.membershipTest(
                jvm.org.apache.hadoop.util.bloom.Key(bytearray(kb)))
            assert ours == theirs, (ht_name, kb)
