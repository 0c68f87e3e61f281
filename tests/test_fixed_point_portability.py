"""Cross-engine fixed-point arithmetic contract (no Spark session):
the linear-probe / PQ / covariance oracles all assume that the
floor-of-IEEE-division idioms evaluate IDENTICALLY in Python (the
driver-side update loop) and DuckDB (the oracle). Hypothesis sweeps
random magnitudes — including past 2^53, where int->double conversion
rounds and both engines must round the SAME way — so the contract is
pinned by property, not by the fixture's lucky values."""

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

MICRO = 1_000_000
HALF = MICRO // 2
SAT = 2 * MICRO

_con = duckdb.connect()


def _duck(expr: str):
    return _con.execute(f"SELECT {expr}").fetchone()[0]


@settings(max_examples=200, deadline=None)
@given(g=st.integers(min_value=-(1 << 62), max_value=1 << 62),
       lrn=st.integers(min_value=1, max_value=64),
       lrd=st.integers(min_value=1, max_value=64),
       n=st.integers(min_value=1, max_value=1 << 40))
def test_update_rule_matches_duckdb(g, lrn, lrd, n):
    """floor(g*lrn / (4.0*lrd*n)) — the GD weight update. Python does
    exact int multiply then int/float division; DuckDB multiplies
    BIGINTs then divides by DOUBLE. Equal iff both convert the same
    product to double the same way (round-half-even) — guard the
    BIGINT range so the product itself cannot overflow 63 bits."""
    if abs(g) * lrn >= 1 << 62:
        return
    want = math.floor(g * lrn / (4.0 * lrd * n))
    got = _duck(f"CAST(FLOOR(CAST({g} AS BIGINT) * {lrn} "
                f"/ (4.0 * {lrd} * {n})) AS BIGINT)")
    assert got == want


@settings(max_examples=200, deadline=None)
@given(m=st.integers(min_value=-(1 << 45), max_value=1 << 45))
def test_hard_sigmoid_matches_duckdb(m):
    """p = clamp(HALF + floor(m/4.0), 0, MICRO) as BIGINT."""
    want = min(max(HALF + math.floor(m / 4.0), 0), MICRO)
    got = _duck(f"CAST(least(greatest({HALF} + FLOOR({m} / 4.0), 0), "
                f"{MICRO}) AS BIGINT)")
    assert got == want
    # saturation flag agrees too
    assert (_duck(f"{m} > -{SAT} AND {m} < {SAT}")
            == (-SAT < m < SAT))


@settings(max_examples=200, deadline=None)
@given(s=st.integers(min_value=-(1 << 62), max_value=1 << 62),
       n=st.integers(min_value=1, max_value=1 << 31))
def test_scaled_floor_div_matches_duckdb(s, n):
    """floor(sum / (n*1e6)) — the covariance / margin projection.
    Past 2^53 the int->double conversion rounds; both engines must
    round-half-even to the same double before the division."""
    want = math.floor(s / (float(n) * MICRO))
    got = _duck(f"CAST(FLOOR(CAST({s} AS BIGINT) "
                f"/ (CAST({n} AS DOUBLE) * {MICRO})) AS BIGINT)")
    assert got == want


@settings(max_examples=200, deadline=None)
@given(cnt=st.integers(min_value=0, max_value=1 << 20),
       tot=st.integers(min_value=1, max_value=1 << 30))
def test_normalized_feature_matches_duckdb(cnt, tot):
    """floor(cnt * 1e6 / tot) — length-normalized features. The
    double quotient is correctly rounded and a non-integer rational
    with denominator tot sits >= 1/tot > half-ulp from any integer,
    so FLOOR is never perturbed (the ops/classify docstring claim)."""
    if cnt > tot:
        cnt, tot = tot, cnt              # frequencies: cnt <= tot
    want = (cnt * MICRO) // tot
    got_py = math.floor(cnt * MICRO / tot)
    got_duck = _duck(f"CAST(FLOOR({cnt} * {MICRO}.0 / {tot}) AS BIGINT)")
    assert got_py == want == got_duck


@settings(max_examples=100, deadline=None)
@given(code=st.integers(min_value=0, max_value=15),
       sub=st.integers(min_value=0, max_value=7))
def test_pq_pack_unpack_roundtrip(code, sub):
    """pack: code * 2^(4*sub) via pow-cast; unpack: floor(packed /
    2^(4*sub)) % 16 — the dyadic shift pair used by the PQ index."""
    packed = _duck(f"CAST({code} * CAST(pow(2, 4 * {sub}) AS BIGINT) "
                   f"AS BIGINT)")
    assert packed == code << (4 * sub)
    got = _duck(f"CAST(FLOOR({packed} / {float(1 << (4 * sub))}) "
                f"AS BIGINT) % 16")
    assert got == code
