"""Property pin for the integer HLL rho (ADVICE r8): for any 52-bit
suffix y, ``length(bin(y & -y))`` equals (trailing zeros of y) + 1 — in
pure Python arithmetic, in DuckDB (the oracle engine), and by extension
in Spark (same minimal-binary-string semantics, covered end-to-end by the
XK-hll oracle comparison). No float/libm anywhere, which is the point:
the previous log2-based derivation relied on the libm quotient landing
exactly on k.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

HLL_Y_BITS = 52


def rho_reference(y: int) -> int:
    """Trailing zeros + 1, the definitional rho."""
    assert y > 0
    tz = (y & -y).bit_length() - 1
    return tz + 1


@given(st.integers(min_value=1, max_value=(1 << HLL_Y_BITS) - 1))
@settings(max_examples=300, deadline=None)
def test_bin_length_identity_pure_python(y):
    assert (y & -y).bit_length() == rho_reference(y)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_bin_length_identity_duckdb_boundaries(duck):
    """DuckDB's length(bin(y & -y)) agrees with the reference at every
    power-of-two boundary 2^0..2^52 and at adversarial neighbors — the
    exact values where a 1-ulp libm log2 error would have flipped rho."""
    cases = []
    for k in range(HLL_Y_BITS + 1):
        cases.append(1 << k)  # y = 2^k: rho = k+1
        if k >= 1:
            cases.append((1 << k) | 1)  # odd: rho = 1
            cases.append((1 << k) - 1)  # all ones below k: rho = 1
    for y in cases:
        got = duck.execute(
            f"SELECT length(bin(CAST({y} AS BIGINT) & (-CAST({y} AS BIGINT))))"
        ).fetchone()[0]
        assert got == rho_reference(y), y


@given(st.integers(min_value=1, max_value=(1 << HLL_Y_BITS) - 1))
@settings(max_examples=60, deadline=None)
def test_bin_length_identity_duckdb_random(duck, y):
    got = duck.execute(
        f"SELECT length(bin(CAST({y} AS BIGINT) & (-CAST({y} AS BIGINT))))"
    ).fetchone()[0]
    assert got == rho_reference(y)
