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


# ---- nested types (round-4: structs/arrays/maps widen recursively) ----

_names = st.sampled_from(["f1", "f2", "f3", "f4"])
nested_types = st.recursive(
    types,
    lambda children: st.one_of(
        st.lists(
            st.tuples(_names, children), min_size=1, max_size=3,
            unique_by=lambda t: t[0],
        ).map(lambda fs: T.StructType(
            [T.StructField(n, d, True) for n, d in fs])),
        children.map(lambda d: T.ArrayType(d, True)),
        children.map(lambda d: T.MapType(T.StringType(), d, True)),
    ),
    max_leaves=5,
)


def _norm(t: T.DataType) -> T.DataType:
    """Field-order-insensitive normal form (struct widening preserves the
    LEFT argument's field order, so commutativity holds up to order)."""
    if isinstance(t, T.StructType):
        return T.StructType(sorted(
            (T.StructField(f.name, _norm(f.dataType), True) for f in t.fields),
            key=lambda f: f.name,
        ))
    if isinstance(t, T.ArrayType):
        return T.ArrayType(_norm(t.elementType), True)
    if isinstance(t, T.MapType):
        return T.MapType(_norm(t.keyType), _norm(t.valueType), True)
    return t


@given(nested_types)
def test_nested_widen_idempotent(a):
    assert widen_type(a, a) == a


@given(nested_types, nested_types)
def test_nested_widen_commutative_up_to_field_order(a, b):
    wa, wb = widen_type(a, b), widen_type(b, a)
    assert (wa is None) == (wb is None)
    if wa is not None:
        assert _norm(wa) == _norm(wb)


@given(nested_types, nested_types)
def test_nested_widen_absorbing(a, b):
    """Widening is a join: widen(a, widen(a, b)) == widen(a, b)."""
    w = widen_type(a, b)
    if w is not None:
        assert _norm(widen_type(a, w)) == _norm(w)


def _contains(wide: T.DataType, narrow: T.DataType) -> bool:
    """wide losslessly contains narrow (every field/element reachable)."""
    if wide == narrow:
        return True
    if isinstance(wide, T.StructType) and isinstance(narrow, T.StructType):
        wf = {f.name: f.dataType for f in wide.fields}
        return all(
            f.name in wf and _contains(wf[f.name], f.dataType)
            for f in narrow.fields
        )
    if isinstance(wide, T.ArrayType) and isinstance(narrow, T.ArrayType):
        return _contains(wide.elementType, narrow.elementType)
    if isinstance(wide, T.MapType) and isinstance(narrow, T.MapType):
        return wide.keyType == narrow.keyType and _contains(
            wide.valueType, narrow.valueType)
    prim_ok = widen_type(wide, narrow)
    return prim_ok == wide


@given(nested_types, nested_types)
def test_nested_widen_contains_both_or_refuses(a, b):
    w = widen_type(a, b)
    if w is not None:
        assert _contains(w, a) and _contains(w, b)


def test_struct_add_only_and_leaf_refusal():
    s1 = T.StructType([T.StructField("city", T.StringType(), True)])
    s2 = T.StructType([
        T.StructField("city", T.StringType(), True),
        T.StructField("geohash", T.StringType(), True),
    ])
    assert widen_type(s1, s2) == s2          # nested field appears -> grows
    assert widen_type(s2, s1) == s2          # old producer: nothing dropped
    bad = T.StructType([T.StructField("city", T.IntegerType(), True)])
    assert widen_type(s1, bad) is None       # nested string -> int refused
    # nested leaf widening inside a struct inside an array
    a1 = T.ArrayType(T.StructType([T.StructField("n", T.IntegerType(), True)]))
    a2 = T.ArrayType(T.StructType([T.StructField("n", T.LongType(), True)]))
    assert widen_type(a1, a2) == T.ArrayType(
        T.StructType([T.StructField("n", T.LongType(), True)]), True)
    # map keys must not re-key
    m1 = T.MapType(T.IntegerType(), T.StringType())
    m2 = T.MapType(T.LongType(), T.StringType())
    assert widen_type(m1, m2) is None
