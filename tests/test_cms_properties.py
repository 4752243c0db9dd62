"""Property-based tests (hypothesis) for count-min estimate guarantees,
over arbitrary value multisets — the one-sided-error contract heavy
hitters rely on, pinned beyond the example corpora. Pure-python twin
(md5 slicing proven equal to the Spark exprs in tests/test_cms.py)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from kp_data_replication_spark.operators.cms import (
    CMS_D,
    CMS_W,
    py_cms_estimate,
)

values = st.lists(
    st.integers(min_value=0, max_value=50).map(str), min_size=1, max_size=400
)


@settings(max_examples=200)
@given(values)
def test_estimate_never_underestimates_any_key(vals):
    from collections import Counter

    true = Counter(vals)
    for k, n in true.items():
        assert py_cms_estimate(vals, k) >= n


@settings(max_examples=200)
@given(values, st.text(min_size=1, max_size=8))
def test_absent_key_estimate_bounded_by_collisions(vals, probe):
    """An absent key's estimate is pure collision mass: bounded by the
    largest row total / 1 (trivially), and zero whenever no value shares
    all D register cells with the probe."""
    from collections import Counter

    true = Counter(vals)
    est = py_cms_estimate(vals, probe)
    if probe in true:
        assert est >= true[probe]
        return
    # est is the min over D independent cells; each cell's count is the
    # sum of colliding values' counts — never more than the stream size
    assert 0 <= est <= len(vals)
    hp = hashlib.md5(probe.encode()).hexdigest()
    cells = {d: int(hp[2 * d:2 * d + 2], 16) for d in range(CMS_D)}
    # if some row has NO collision, the min must be 0
    for d in range(CMS_D):
        colliders = [
            v for v in true
            if int(hashlib.md5(v.encode()).hexdigest()[2 * d:2 * d + 2], 16)
            == cells[d]
        ]
        if not colliders:
            assert est == 0
            break


@settings(max_examples=100)
@given(values)
def test_estimate_is_merge_invariant(vals):
    """Splitting the stream arbitrarily and summing registers (what the
    incremental view does across epochs) changes no estimate — linearity
    at the estimate level, not just the register level."""
    half = len(vals) // 2
    a, b = vals[:half], vals[half:]

    def regs(stream):
        r: dict = {}
        for v in stream:
            h = hashlib.md5(v.encode()).hexdigest()
            for d in range(CMS_D):
                k = (d, int(h[2 * d:2 * d + 2], 16))
                r[k] = r.get(k, 0) + 1
        return r

    merged = regs(a)
    for k, n in regs(b).items():
        merged[k] = merged.get(k, 0) + n
    assert merged == regs(vals)
    assert all(0 <= k[1] < CMS_W for k in merged)
