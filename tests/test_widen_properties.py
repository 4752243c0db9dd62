"""Property-based checks of the type-widening lattice (pure functions, no
Spark session): widening must be commutative, idempotent, monotone (never
narrowing), and refuse anything lossy — these are the invariants schema
evolution's correctness rests on (S6; Delta/Iceberg type-widening rules)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import types as T

from kp_data_replication_spark.operators.merge import widen_type

PRIMS = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(), T.BooleanType(),
    T.BinaryType(), T.DateType(), T.TimestampType(),
]
_RANK = {T.ByteType(): 1, T.ShortType(): 2, T.IntegerType(): 3, T.LongType(): 4}

types = st.sampled_from(PRIMS)


@given(types, types)
def test_widen_commutative(a, b):
    assert widen_type(a, b) == widen_type(b, a)


@given(types)
def test_widen_idempotent(a):
    assert widen_type(a, a) == a


@given(types, types)
def test_widen_contains_both_or_refuses(a, b):
    """The result (when any) must losslessly contain BOTH inputs: an int
    result at least as wide as any int input; float inputs only ever land
    in double (or stay float when equal); no silent cross-kind coercion."""
    w = widen_type(a, b)
    if w is None:
        return
    for x in (a, b):
        if x in _RANK:
            assert w in _RANK or w == T.DoubleType()
            if w in _RANK:
                assert _RANK[w] >= _RANK[x]
            else:  # promoted to double: only exact for byte/short/int
                assert _RANK[x] <= 3
        elif x in (T.FloatType(), T.DoubleType()):
            assert w in (T.FloatType(), T.DoubleType())
        else:
            assert w == x  # string/bool/binary/date/ts never coerce


@given(types, types)
def test_widen_refuses_cross_kind(a, b):
    """Anything outside the numeric lattice only widens with itself."""
    numeric = set(_RANK) | {T.FloatType(), T.DoubleType()}
    if (a not in numeric or b not in numeric) and a != b:
        assert widen_type(a, b) is None


def test_long_to_double_is_refused():
    # the one tempting-but-lossy edge: long -> double drops precision
    assert widen_type(T.LongType(), T.DoubleType()) is None
    assert widen_type(T.DoubleType(), T.LongType()) is None
