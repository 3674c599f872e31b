"""Property-based tests (hypothesis) for the pure-numpy HDF5 codec.

The hand-picked cases in tests/test_sources.py cover the known layout
families (contiguous, chunked, deflate, multi-leaf and level-2 chunk
B-trees); this file drives the same write -> read loop over RANDOM
structures - dtype x rank x shape x chunk grid x filter x group
fan-out - so edge geometries nobody thought to hand-pick (1-element
chunks, chunk == shape, padded edge chunks in both dims at once,
empty datasets next to chunked siblings, many small groups) are
exercised on every run.  Exactness is bit-level: NaN patterns in
float payloads must survive (equal_nan compare), and int64 extremes
must not be disturbed by the chunk padding path.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_daq_spark import minihdf5 as m

_SETTINGS = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_DTYPES = [np.int64, np.int32, np.uint16, np.float64, np.float32]


@st.composite
def _dataset(draw):
    dt = np.dtype(draw(st.sampled_from(_DTYPES)))
    rank = draw(st.integers(1, 2))
    if rank == 1:
        shape = (draw(st.integers(0, 120)),)
    else:
        shape = (draw(st.integers(1, 24)), draw(st.integers(1, 24)))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    n = int(np.prod(shape))
    if dt.kind == "f":
        arr = rng.standard_normal(n).astype(dt)
        # salt in the values a naive codec corrupts: NaN, infs, -0.0
        if n >= 4:
            arr[rng.integers(0, n)] = np.nan
            arr[rng.integers(0, n)] = np.inf
            arr[rng.integers(0, n)] = -0.0
    else:
        info = np.iinfo(dt)
        arr = rng.integers(info.min, info.max, size=n, dtype=np.int64).astype(dt)
        if n >= 2:
            arr[0], arr[n - 1] = info.min, info.max
    arr = arr.reshape(shape)
    chunked = n > 0 and draw(st.booleans())
    if not chunked:
        return arr
    chunks = tuple(draw(st.integers(1, max(d, 1))) for d in shape)
    spec = {"data": arr, "chunks": chunks}
    if draw(st.booleans()):
        spec["gzip"] = draw(st.integers(1, 9))
    return spec


_GROUPS = st.dictionaries(
    st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
    st.dictionaries(
        st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
        _dataset(),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=3,
)


def _payload(spec):
    return spec["data"] if isinstance(spec, dict) else spec


@given(groups=_GROUPS)
@settings(**_SETTINGS)
def test_minihdf5_random_structures_roundtrip(groups):
    blob = m.write_hdf5(None, groups)
    back = m.read_hdf5(blob)
    assert set(back) == set(groups)
    for g, dsets in groups.items():
        assert set(back[g]) == set(dsets)
        for name, spec in dsets.items():
            want = _payload(spec)
            got = back[g][name]
            assert got.dtype == want.dtype, (g, name)
            assert got.shape == want.shape, (g, name)
            if want.dtype.kind == "f":
                assert np.array_equal(got, want, equal_nan=True), (g, name)
                # -0.0 and NaN payloads must be BIT-exact, not just
                # value-equal
                assert got.tobytes() == want.tobytes(), (g, name)
            else:
                assert np.array_equal(got, want), (g, name)


@given(
    n=st.integers(1, 900),
    chunk=st.integers(1, 64),
    gzip=st.one_of(st.none(), st.integers(1, 9)),
)
@settings(**_SETTINGS)
def test_minihdf5_chunk_count_sweep(n, chunk, gzip):
    """1-D sweep that freely crosses the leaf-capacity boundaries of
    the chunk B-tree (up to 900 chunks at chunk=1), with and without
    deflate - the geometry knob the hand-picked tests fix at a few
    points."""
    arr = np.arange(n, dtype=np.int64) * 3 - n
    spec: dict[str, object] = {"data": arr, "chunks": (chunk,)}
    if gzip is not None:
        spec["gzip"] = gzip
    blob = m.write_hdf5(None, {"g": {"x": spec}})
    got = m.read_hdf5(blob)["g"]["x"]
    assert got.dtype == arr.dtype and got.shape == arr.shape
    assert np.array_equal(got, arr)
