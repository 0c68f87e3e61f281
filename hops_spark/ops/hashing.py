"""Hadoop hash-family parity: MurmurHash (Murmur2) and JenkinsHash
(Bob Jenkins' lookup3) with the reference's exact int32 semantics
(hadoop-common-project/hadoop-common/src/main/java/org/apache/hadoop/
util/hash/MurmurHash.java, JenkinsHash.java — the two members of the
``Hash.getInstance`` registry that BloomFilter/HashFunction key on).

Parity is PROVEN, not assumed: tests/test_hashing.py property-tests
these against the actual Hadoop classes on the Spark JVM classpath,
and builds a real org.apache.hadoop.util.bloom.BloomFilter whose
membership bits must equal the grid built from ``hash_function_offsets``
(the HashFunction chaining contract: hash_i seeds hash_{i+1}).

Scale note: these are per-row Python (the compatibility path for
reading/validating artifacts keyed by Hadoop hashes); the engine's own
bloom/sketch family hashes with md5 Column expressions (ops/bloom.py)
— JVM-side and oracle-portable — which is the hot path.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF


def _signed32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x & 0x80000000 else x


def murmur_hash(data: bytes, seed: int = -1) -> int:
    """Murmur2, Hadoop variant: little-endian 4-byte blocks with a
    SIGN-EXTENDING high byte, sign-extending tail bytes, m=0x5bd1e995,
    r=24. Returns Java int (signed 32-bit)."""
    m, r = 0x5BD1E995, 24
    length = len(data)
    h = (seed ^ length) & _M32
    len4 = length >> 2
    for i in range(len4):
        i4 = i << 2
        # Java: k starts from the SIGNED byte data[i4+3], then shifts
        # in the lower three bytes masked — high-byte sign survives
        # only through the int truncation.
        k = data[i4 + 3] - 256 if data[i4 + 3] & 0x80 else data[i4 + 3]
        k = (k << 8) | data[i4 + 2]
        k = (k << 8) | data[i4 + 1]
        k = ((k << 8) | data[i4]) & _M32
        k = (k * m) & _M32
        k ^= k >> r
        k = (k * m) & _M32
        h = (h * m) & _M32
        h ^= k
    left = length - (len4 << 2)
    if left:
        def _sx(b: int) -> int:          # sign-extended Java byte
            return (b - 256 if b & 0x80 else b) & _M32
        if left >= 3:
            h ^= (_sx(data[length - 3]) << 16) & _M32
        if left >= 2:
            h ^= (_sx(data[length - 2]) << 8) & _M32
        if left >= 1:
            h ^= _sx(data[length - 1])
        h = (h * m) & _M32
    h ^= h >> 13
    h = (h * m) & _M32
    h ^= h >> 15
    return _signed32(h)


def _rot(x: int, k: int) -> int:
    x &= _M32
    return ((x << k) | (x >> (32 - k))) & _M32


def jenkins_hash(data: bytes, initval: int = 0) -> int:
    """Bob Jenkins' lookup3 ``hashlittle`` as JenkinsHash.java computes
    it (12-byte blocks; zero-length input returns c WITHOUT the final
    mix — the Java switch's case 0). Returns Java int."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + (initval & _M32)) & _M32
    off = 0
    while length > 12:
        a = (a + data[off] + (data[off + 1] << 8) + (data[off + 2] << 16)
             + (data[off + 3] << 24)) & _M32
        b = (b + data[off + 4] + (data[off + 5] << 8) + (data[off + 6] << 16)
             + (data[off + 7] << 24)) & _M32
        c = (c + data[off + 8] + (data[off + 9] << 8) + (data[off + 10] << 16)
             + (data[off + 11] << 24)) & _M32
        # mix(a,b,c)
        a = (a - c) & _M32; a ^= _rot(c, 4); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot(a, 6); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot(b, 8); b = (b + a) & _M32
        a = (a - c) & _M32; a ^= _rot(c, 16); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot(a, 19); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot(b, 4); b = (b + a) & _M32
        off += 12
        length -= 12
    # tail (Java switch with fall-through)
    if length == 0:
        return _signed32(c)
    if length >= 12:
        c = (c + (data[off + 11] << 24)) & _M32
    if length >= 11:
        c = (c + (data[off + 10] << 16)) & _M32
    if length >= 10:
        c = (c + (data[off + 9] << 8)) & _M32
    if length >= 9:
        c = (c + data[off + 8]) & _M32
    if length >= 8:
        b = (b + (data[off + 7] << 24)) & _M32
    if length >= 7:
        b = (b + (data[off + 6] << 16)) & _M32
    if length >= 6:
        b = (b + (data[off + 5] << 8)) & _M32
    if length >= 5:
        b = (b + data[off + 4]) & _M32
    if length >= 4:
        a = (a + (data[off + 3] << 24)) & _M32
    if length >= 3:
        a = (a + (data[off + 2] << 16)) & _M32
    if length >= 2:
        a = (a + (data[off + 1] << 8)) & _M32
    if length >= 1:
        a = (a + data[off]) & _M32
    # final(a,b,c)
    c ^= b; c = (c - _rot(b, 14)) & _M32
    a ^= c; a = (a - _rot(c, 11)) & _M32
    b ^= a; b = (b - _rot(a, 25)) & _M32
    c ^= b; c = (c - _rot(b, 16)) & _M32
    a ^= c; a = (a - _rot(c, 4)) & _M32
    b ^= a; b = (b - _rot(a, 14)) & _M32
    c ^= b; c = (c - _rot(b, 24)) & _M32
    return _signed32(c)


MURMUR, JENKINS = "murmur", "jenkins"
_FNS = {MURMUR: murmur_hash, JENKINS: jenkins_hash}


def hash_function_offsets(key: bytes, max_value: int, nb_hash: int,
                          hash_type: str = MURMUR) -> list[int]:
    """The reference's HashFunction.hash contract (util/bloom/
    HashFunction.java): k positions where hash_i = H(key, seed=prev)
    chained from seed 0, each folded as abs(h % maxValue) — Java's
    Math.abs of the SIGNED remainder. These are the exact bit indices
    Hadoop's BloomFilter family sets; parity is asserted against the
    real class in tests/test_hashing.py."""
    fn = _FNS[hash_type]
    out, initval = [], 0
    for _ in range(nb_hash):
        initval = fn(key, initval)
        # Java Math.abs(signed % maxValue) == abs(h) % maxValue
        out.append(abs(initval) % max_value)
    return out
