"""Model-based catalog check: random op sequences vs a pure-Python model.

Hypothesis drives random sequences of append / replace / compact /
stage+publish / stage+discard / rollback over one table, and a trivial
Python model tracks what the visible row-set must be after every
operation AND at every historical snapshot. The catalog must agree with
the model on the current read after each step and on time travel to every
snapshot at the end — the snapshot-isolation contract under arbitrary
interleavings, not just the hand-written scenarios.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hk_housing_datahub_spark.sources import TableCatalog

_op = st.sampled_from(
    ["append", "replace", "compact", "wap_publish", "wap_discard", "rollback"]
)
_ops = st.lists(_op, min_size=3, max_size=7)


@given(_ops)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_catalog_agrees_with_model(spark, ops):
    root = tempfile.mkdtemp(prefix="catmodel_")
    cat = TableCatalog(spark, root)
    try:
        nxt = [0]  # unique id supply

        def fresh(k=5):
            lo = nxt[0]
            nxt[0] += k
            return lo, spark.range(lo, lo + k).coalesce(1)

        model: dict[int, set[int]] = {0: set()}  # snapshot -> visible ids
        cur: set[int] = set()
        version = 0

        def commit(new_cur):
            nonlocal cur, version
            cur = new_cur
            version += 1
            model[version] = set(cur)

        for op in ops:
            if op == "append":
                lo, df = fresh()
                got = cat.append("t", df)
                commit(cur | set(range(lo, lo + 5)))
                assert got == version
            elif op == "replace":
                lo, df = fresh()
                got = cat.replace("t", df)
                commit(set(range(lo, lo + 5)))
                assert got == version
            elif op == "compact":
                if not cur:
                    continue  # compacting an empty/absent table: skip
                got = cat.compact("t", partitions=1)
                commit(set(cur))  # data-equivalent
                assert got == version
            elif op in ("wap_publish", "wap_discard"):
                lo, df = fresh()
                s = cat.append("t", df, staged=True)
                commit(set(cur))  # staging changes nothing visible
                assert s == version
                if op == "wap_publish":
                    got = cat.publish_staged("t", s)
                    commit(cur | set(range(lo, lo + 5)))
                    assert got == version
                else:
                    cat.discard_staged("t", s)
            elif op == "rollback":
                if version == 0:
                    continue
                target = version // 2 or version
                got = cat.rollback("t", target)
                commit(set(model[target]))
                assert got == version
            # current read agrees with the model after EVERY op
            if cur or version:
                try:
                    seen = {r.id for r in cat.read("t").collect()}
                except FileNotFoundError:
                    seen = set()
                assert seen == cur, (op, version)

        # time travel agrees with the model at every snapshot (no vacuum
        # ran, so all snapshots are still resolvable)
        for s, want in model.items():
            if s == 0:
                continue
            try:
                got = {r.id for r in cat.read("t", snapshot=s).collect()}
            except FileNotFoundError:
                got = set()
            assert got == want, f"snapshot {s}"
        assert cat.current_snapshot("t") == version
    finally:
        shutil.rmtree(root)
