"""Property-based depth for the round-6 mirrored conventions.

The poked-tier sweeps pin the conventions on fixed payload classes;
these hypothesis tests pin them on RANDOM inputs, engine-vs-engine
without Spark: the DuckDB oracle spelling of each convention must equal
an independent pure-Python model on arbitrary strings. (The Spark side
of each convention is pinned by the tier sweeps and the
test_ascii_fold_contract unit test — these properties close the
oracle-spelling half.)
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.unit

_A_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_A_LO = "abcdefghijklmnopqrstuvwxyz"
_FOLD = str.maketrans(_A_UP, _A_LO)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


# arbitrary unicode minus surrogates (not encodable to UTF-8 for DuckDB)
# and NUL (DuckDB varchar rejects embedded NUL)
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_ascii_fold_oracle_spelling_matches_python(duck, s):
    """translate(x, A-Z, a-z) in DuckDB == str.translate ASCII fold —
    and fully Unicode-insensitive (every non-A-Z codepoint untouched)."""
    got = duck.execute(
        f"SELECT translate(?, '{_A_UP}', '{_A_LO}')", [s]
    ).fetchone()[0]
    assert got == s.translate(_FOLD)


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_ascii_trim_oracle_spelling_matches_python(duck, s):
    """trim(x, ' ') strips exactly ASCII spaces (DuckDB's bare trim()
    strips Unicode whitespace — the unicode tier caught U+3000)."""
    got = duck.execute("SELECT trim(?, ' ')", [s]).fetchone()[0]
    assert got == s.strip(" ")


def _spark_nonansi_string_to_int(s: str) -> int | None:
    """Pure-Python model of the numeric-string truncation convention:
    parse as decimal number, truncate toward zero, NULL on
    non-numeric/overflow/non-finite — the behavior the tier pinned for
    Spark's non-ANSI string->int cast on JSON-extracted values."""
    try:
        f = float(s)
    except (ValueError, OverflowError):
        return None
    if math.isnan(f) or math.isinf(f):
        return None
    t = math.trunc(f)
    if not (-(2**31) <= t <= 2**31 - 1):
        return None
    return int(t)


_NUMISH = st.one_of(
    st.integers(-(10**25), 10**25).map(str),
    st.floats(allow_nan=False, allow_infinity=False).map(repr),
    st.sampled_from(["true", "false", "12.7", "-12.7", "", "abc", "1e3",
                     "99999999999999999999", "0.004", "-0.5", "nan", "inf"]),
)


@settings(max_examples=300, deadline=None)
@given(_NUMISH)
def test_truncation_convention_oracle_spelling(duck, s):
    """TRY_CAST(trunc(TRY_CAST(x AS DOUBLE)) AS INTEGER) == the Python
    truncation model, for integral, decimal, scientific, boolean-word,
    overflow and junk strings alike."""
    got = duck.execute(
        "SELECT TRY_CAST(trunc(TRY_CAST(? AS DOUBLE)) AS INTEGER)", [s]
    ).fetchone()[0]
    want = _spark_nonansi_string_to_int(s)
    if want is not None and abs(want) > 2**53:
        return  # double can't hold the exact integer; tier never produces these
    assert got == want, f"{s!r}: {got} != {want}"
