"""Property-based tests (hypothesis): the batch interval merge and the
MERGE-table semantics checked against straight-line python references
over randomized inputs - the cases hand-written fixtures miss
(adjacent-at-exactly-gap boundaries, single-TA islands, interleaved
src_ids, merge/update orderings).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_daq_spark.streaming import plan

# keep each example to one tiny Spark job; suite budget ~30 s
_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

GAP = 100


def _ref_merge(
    tas: list[tuple[int, int, int]], cap: int | None = None
) -> list[tuple[int, int, int, int]]:
    """Python reference: sort by (first, last), coalesce while the next
    TA starts within GAP of the island's max last_tick and (when capped)
    would not stretch the decision past ``cap`` ticks from its start."""
    out = []
    for first, last, n_tps in sorted(tas):
        if (
            out
            and first <= out[-1][1] + GAP
            and (cap is None or last - out[-1][0] <= cap)
        ):
            s, e, n, c = out[-1]
            out[-1] = (s, max(e, last), n + n_tps, c + 1)
        else:
            out.append((first, last, n_tps, 1))
    return out


ta_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3000),  # first_tick
        st.integers(min_value=0, max_value=500),  # duration
        st.integers(min_value=1, max_value=50),  # n_tps
    ),
    min_size=1,
    max_size=12,
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@given(tas=ta_lists)
@settings(**_SETTINGS)
def test_merge_decisions_matches_python_reference(_spark, tas):
    rows = [(0, f, f + d, int(n)) for f, d, n in tas]
    df = _spark.createDataFrame(
        rows, "src_id int, first_tick long, last_tick long, n_tps long"
    )
    got = sorted(
        (r["td_start_tick"], r["td_end_tick"], r["n_tps"], r["n_tas"])
        for r in plan.merge_decisions(df, max_gap_ticks=GAP).collect()
    )
    want = sorted(_ref_merge([(f, f + d, n) for f, d, n in tas]))
    assert got == want
    # capped form (mlt_max_td_length): same fold with the length cap -
    # cap 400 is small enough that random inputs regularly split on it
    got_cap = sorted(
        (r["td_start_tick"], r["td_end_tick"], r["n_tps"], r["n_tas"])
        for r in plan.merge_decisions(df, max_gap_ticks=GAP, max_td_ticks=400).collect()
    )
    want_cap = sorted(_ref_merge([(f, f + d, n) for f, d, n in tas], cap=400))
    assert got_cap == want_cap


merge_steps = st.lists(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 9)),  # (key, value)
        min_size=1,
        max_size=4,
        unique_by=lambda kv: kv[0],  # MERGE source must be key-unique
    ),
    min_size=1,
    max_size=4,
)


@given(steps=merge_steps)
@settings(**_SETTINGS)
def test_merge_table_matches_dict_semantics(_spark, steps, tmp_path_factory):
    """A sequence of MERGEs must equal last-writer-wins dict updates."""
    from iceberg_daq_spark.tablestore import MergeTable

    t = MergeTable(
        str(tmp_path_factory.mktemp("prop") / "t"), key_cols=("k",), keep_versions=1
    )
    ref: dict[int, int] = {}
    for step in steps:
        t.merge(_spark.createDataFrame(step, "k int, v int"))
        ref.update(dict(step))
    got = {r["k"]: r["v"] for r in t.read(_spark).collect()}
    assert got == ref
