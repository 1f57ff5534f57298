"""Property tests pinning the float-literal discipline (round-7, a730744).

Two cross-engine 1-ulp traps are load-bearing knowledge in this repo
(also recorded in the project memory and ARCHITECTURE.md):

1. **Bare-literal DECIMAL parse**: DuckDB parses a bare numeric literal
   like ``7.4965`` as DECIMAL and evaluates DECIMAL arithmetic exactly,
   converting to double ONCE at the end — while Spark (and Python)
   round after every double op. The results differ by 1 ulp on real
   inputs (regression case pinned below), which the value-hash compare
   reads as a wrong answer. Discipline: emit every float literal into
   oracle SQL as ``CAST('<repr(v)>' AS DOUBLE)``.

2. **FMA contraction**: ``a*b+c`` in one scalar expression may be
   contracted to a fused multiply-add (one rounding instead of two)
   depending on engine build/codegen. Discipline: materialize the
   product as its own projection level so both engines round the
   product before the add.

These tests certify the discipline itself — any quoted-string-cast
literal round-trips bit-exactly for a grid of magnitudes plus
hypothesis-generated doubles, and the two-level product form always
equals Python's two-rounding semantics (Spark's semantics: JVM doubles,
no contraction in Catalyst codegen) — so a refactor that silently
reintroduces bare literals or single-expression mul-adds fails here
before it can flake an oracle compare.
"""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _duck1(sql: str) -> float:
    v = duckdb.sql(sql).fetchone()[0]
    return float(v)


# --- 1. quoted-string casts round-trip bit-exactly --------------------------

# Fixed magnitude grid: subnormal edge to overflow edge, both signs,
# plus the repo's actual precomputed constants.
_GRID = [
    0.0,
    5e-324,  # smallest subnormal
    2.2250738585072014e-308,  # smallest normal
    1e-300, 1e-100, 1e-10, 0.1, 1.0 / 3.0, 0.5, 1.0,
    1.4826, 3.0 * 1.4826,  # the hampel_filter constants (windows.py)
    math.pi, 1e10, 2**53 - 1.0, 2**53 + 2.0, 1e100, 1e300,
    1.7976931348623157e308,  # DBL_MAX
]
_GRID += [-x for x in _GRID]


@pytest.mark.parametrize("v", _GRID, ids=[repr(v) for v in _GRID])
def test_string_cast_roundtrips_grid(v: float) -> None:
    got = _duck1(f"SELECT CAST('{v!r}' AS DOUBLE)")
    assert _bits(got) == _bits(v), (got.hex(), v.hex())


@settings(max_examples=300, deadline=None)
@given(
    st.floats(
        allow_nan=False, allow_infinity=False, allow_subnormal=True
    )
)
def test_string_cast_roundtrips_hypothesis(v: float) -> None:
    """repr(v) is shortest-round-trip in Python; DuckDB's string->DOUBLE
    parse must be correctly rounded for the round trip to hold."""
    got = _duck1(f"SELECT CAST('{v!r}' AS DOUBLE)")
    assert _bits(got) == _bits(v), (got.hex(), v.hex())


# --- 2. the bare-literal DECIMAL trap is real (regression pin) --------------


def test_bare_literal_decimal_parse_trap_is_real() -> None:
    """7.4965 * 6.9286: DECIMAL-exact product rounded once differs from
    the double product rounded twice by 1 ulp. If this ever starts
    passing with bare literals, the discipline can be revisited — until
    then it proves why quoted-string casts are mandatory."""
    py = 7.4965 * 6.9286
    bare = _duck1("SELECT 7.4965 * 6.9286")
    cast = _duck1("SELECT CAST('7.4965' AS DOUBLE) * CAST('6.9286' AS DOUBLE)")
    assert _bits(cast) == _bits(py), (cast.hex(), py.hex())
    assert _bits(bare) != _bits(py), "bare-literal trap no longer fires"


# --- 3. materialized products match two-rounding semantics ------------------


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
)
def test_two_level_product_matches_double_semantics(
    a: float, b: float, c: float
) -> None:
    """The disciplined form — product materialized as its own
    projection, then added — must equal Python/JVM two-rounding
    arithmetic bit-for-bit regardless of whether the engine would
    contract a single-expression a*b+c to an FMA."""
    py = a * b + c
    got = _duck1(
        f"SELECT p + CAST('{c!r}' AS DOUBLE) FROM "
        f"(SELECT CAST('{a!r}' AS DOUBLE) * CAST('{b!r}' AS DOUBLE) AS p)"
    )
    assert _bits(got) == _bits(py), (got.hex(), py.hex())


def test_two_level_product_known_near_cancellation() -> None:
    """Near-cancellation case found by search where fused and two-step
    results differ — the inputs that expose contraction if an engine
    applies it."""
    a = float.fromhex("0x1.3cdb566f453bap-1")
    b = float.fromhex("-0x1.f958639edf668p-1")
    c = float.fromhex("0x1.3928ae946fb76p-1")
    py = a * b + c
    got = _duck1(
        f"SELECT p + CAST('{c!r}' AS DOUBLE) FROM "
        f"(SELECT CAST('{a!r}' AS DOUBLE) * CAST('{b!r}' AS DOUBLE) AS p)"
    )
    assert _bits(got) == _bits(py)
