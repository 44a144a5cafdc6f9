"""Property-based invariants for deterministic sampling and packing.

Pure-Python twins of the Column expressions let hypothesis sweep the
parameter space cheaply (hashlib.md5 == Spark md5 by definition — the
cross-engine identity is pinned separately in test_sampling_packing.py
against live Spark and in the driver oracle against DuckDB).
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from hk_housing_datahub_spark.operators.sampling import _SEP, rate_to_hex

_keys = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters=[_SEP, "\x00"]
        ),
        max_size=24,
    ),
    min_size=1,
    max_size=500,
    unique=True,
)


def _member(key: str, rate: float, salt: str = "") -> bool:
    h = hashlib.md5(f"{salt}{_SEP}{key}".encode()).hexdigest()[:8]
    return h < rate_to_hex(rate)


@given(_keys, st.floats(0.0, 1.0), st.floats(0.0, 1.0))
@settings(max_examples=60, deadline=None)
def test_sample_monotone_in_rate(keys, r1, r2):
    """The sample at a lower rate is a SUBSET of the sample at a higher
    rate (same salt) — growing a sample never churns existing members."""
    lo, hi = sorted([r1, r2])
    a = {k for k in keys if _member(k, lo)}
    b = {k for k in keys if _member(k, hi)}
    assert a <= b


@given(_keys, st.floats(0.0, 1.0))
@settings(max_examples=40, deadline=None)
def test_sample_rate_bounds(keys, rate):
    """rate 0 keeps nothing; rate 1 keeps EVERYTHING (the 'ffffffff'
    prefix edge included); realized fraction is plausible in between."""
    got = {k for k in keys if _member(k, rate)}
    if rate == 0.0:
        assert not got
    if rate == 1.0:
        assert got == set(keys)


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=200, deadline=None)
def test_rate_to_hex_roundtrip(v):
    """Thresholds are the exact hex of floor(rate * 16^8): every 32-bit
    boundary value maps to itself through rate→hex→int."""
    rate = v / 16**8
    assert int(rate_to_hex(rate), 16) == v


@given(
    st.lists(st.integers(1, 5000), min_size=1, max_size=400),
    st.integers(1, 10_000),
)
@settings(max_examples=60, deadline=None)
def test_offset_packing_invariants(weights, budget):
    """The packing rule (bin = start_offset // budget), checked as pure
    arithmetic over one bucket: bins are dense from 0, non-decreasing in
    layout order, every non-final bin's fill reaches the budget once its
    straddling doc lands, and total fill is conserved."""
    start = 0
    bins: dict[int, int] = {}
    order = []
    for w in weights:
        b = start // budget
        bins[b] = bins.get(b, 0) + w
        order.append(b)
        start += w
    ids = sorted(bins)
    assert ids[0] == 0  # layout starts at bin 0
    assert order == sorted(order)  # monotone in layout order
    assert sum(bins.values()) == sum(weights)  # conservation
    for b in ids[:-1]:
        # the next bin starts past (b+1)*budget, so everything up to that
        # boundary was laid down: cumulative fill through b >= boundary
        cum = sum(bins[x] for x in ids if x <= b)
        assert cum >= (b + 1) * budget
    # a gap in the bin ids exists ONLY where an oversized doc straddled
    # it: the fill laid down before the gap already covers the gap's span
    for a, c in zip(ids, ids[1:]):
        if c > a + 1:
            cum = sum(bins[x] for x in ids if x <= a)
            assert cum >= c * budget
