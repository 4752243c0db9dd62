"""Property-based tests (hypothesis) for the HDR binning algebra — the
invariants the quantile guarantees rest on, pinned over the whole long
domain rather than example points. Pure-python twins (exact same
integer math as the Spark exprs, proven equal in tests/test_hdr.py), so
thousands of examples run in milliseconds."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kp_data_replication_spark.operators.hdr import (
    HDR_SUB,
    py_hdr_bin,
    py_hdr_quantile,
)

longs = st.integers(min_value=0, max_value=(1 << 62) - 1)


def _bounds(b: int) -> tuple[int, int]:
    if b < HDR_SUB:
        return b, b
    shift = b // HDR_SUB - 1
    sub = b - shift * HDR_SUB
    return sub << shift, ((sub + 1) << shift) - 1


@given(longs)
def test_value_lies_in_its_own_bin(v):
    lo, hi = _bounds(py_hdr_bin(v))
    assert lo <= v <= hi


@given(longs)
def test_relative_width_bounded(v):
    lo, hi = _bounds(py_hdr_bin(v))
    if hi >= HDR_SUB:
        assert (hi - lo) <= max(1, lo // HDR_SUB)  # <= 1/16 relative


@given(longs, longs)
def test_binning_is_monotone(a, b):
    if a <= b:
        assert py_hdr_bin(a) <= py_hdr_bin(b)
    else:
        assert py_hdr_bin(a) >= py_hdr_bin(b)


@given(st.integers(min_value=0, max_value=(1 << 62) - 2))
def test_bins_tile_the_domain_without_gaps(v):
    """Consecutive values land in the same bin or adjacent bins — the
    binning partitions the domain (no value is skipped or double-binned,
    which would corrupt cumulative ranks)."""
    b1, b2 = py_hdr_bin(v), py_hdr_bin(v + 1)
    assert b2 - b1 in (0, 1)
    if b2 == b1 + 1:
        # boundary: v is its bin's hi, v+1 is the next bin's lo
        assert _bounds(b1)[1] == v and _bounds(b2)[0] == v + 1


@settings(max_examples=200)
@given(st.lists(longs, min_size=1, max_size=200),
       st.floats(min_value=0.01, max_value=1.0,
                 allow_nan=False, allow_infinity=False))
def test_quantile_bounds_always_contain_the_true_rank_value(values, q):
    """The headline guarantee, over arbitrary multisets and quantiles:
    the true rank-q order statistic lies inside the reported bounds."""
    lo, hi = py_hdr_quantile(values, q)
    true_v = sorted(values)[math.ceil(q * len(values)) - 1]
    assert lo <= true_v <= hi
