"""Property-based tests (hypothesis) for the pure-Python kernels:
bloom filters, batch packing, name validation. These run without a
SparkSession, so they're fast enough for wide input sweeps."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ariadne_spark.functions import bloom as bloomfn
from ariadne_spark.plans.batching import FileAnalysis, create_batches
from ariadne_spark.storage.paths import validate_index_name
from ariadne_spark.exceptions import InvalidIndexNameError

values_strategy = st.lists(
    st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.text(max_size=40),
        st.floats(allow_nan=False, allow_infinity=False),
    ),
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(values_strategy)
def test_bloom_never_false_negative(vals):
    blob = bloomfn.build(vals, fpr=0.01)
    assert all(bloomfn.might_contain(blob, v) for v in vals)


@settings(max_examples=100, deadline=None)
@given(values_strategy, values_strategy)
def test_bloom_probe_any_consistency(vals, probes):
    """might_contain_any(hash_values(P)) is True iff some p∈P probes
    positive individually — the batched probe is exactly the OR."""
    blob = bloomfn.build(vals, fpr=0.01)
    pairs = bloomfn.hash_values(probes)
    batched = bloomfn.might_contain_any(blob, pairs)
    single = any(bloomfn.might_contain(blob, p) for p in probes if p is not None)
    assert batched == single


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=10**7)),
        min_size=0,
        max_size=60,
    ),
    st.integers(min_value=10, max_value=10**6),
)
def test_packing_invariants(sizes, budget):
    analyses = [FileAnalysis(f"f{i}", s[0]) for i, s in enumerate(sizes)]
    batches = create_batches(analyses, budget)
    placed = sorted(f for b in batches for f in b)
    assert placed == sorted(a.filename for a in analyses)  # exactly once
    counts = {a.filename: a.max_distinct for a in analyses}
    for b in batches:
        assert b, "no empty batches"
        if len(b) > 1:
            assert sum(counts[f] for f in b) <= budget
        else:
            pass  # singleton batches may exceed budget (oversize isolation)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=64))
def test_name_validation_never_escapes(name):
    """Any accepted name stays inside the indexes/ directory."""
    import os

    try:
        validate_index_name(name)
    except InvalidIndexNameError:
        return
    path = os.path.normpath(os.path.join("/store/indexes", name))
    assert path.startswith("/store/indexes/")
    assert "/" not in name and "\\" not in name


@given(
    st.lists(
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=8,
    ).filter(lambda fs: 0.999 <= sum(fs) <= 1.001 or True)
)
@settings(max_examples=200, deadline=None)
def test_split_thresholds_monotonic_and_complete(raw):
    """Bounds are monotonically non-decreasing hex strings of fixed
    width, and the final bound covers the whole md5-prefix space, so
    every row gets exactly one label."""
    from ariadne_spark.operators.corpus import (
        _SPLIT_HEX_CHARS,
        split_thresholds,
    )

    total = sum(raw)
    fractions = {f"s{i}": v / total for i, v in enumerate(raw)}
    pairs = split_thresholds(fractions)
    bounds = [b for _, b in pairs]
    # every bound is a fixed-width hex string or the "g" sentinel that
    # lex-sorts above every possible prefix (a 4-char "1000" would
    # sort BELOW most 3-char prefixes and misroute rows — regression)
    assert all(len(b) == _SPLIT_HEX_CHARS or b == "g" for b in bounds)
    assert bounds == sorted(bounds)  # lexicographic == routing order
    assert bounds[-1] == "g" or int(bounds[-1], 16) <= 16 ** _SPLIT_HEX_CHARS


import numpy as np

from ariadne_spark.operators.quantization import _encode_matrix, _normalize_rows

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),  # rows
    st.integers(min_value=1, max_value=4),   # subspaces
    st.integers(min_value=1, max_value=4),   # dsub
    st.integers(min_value=1, max_value=6),   # centroids
    st.data(),
)
def test_pq_encode_matrix_assigns_nearest_with_lowest_id_ties(
    n, m, dsub, k, data
):
    dim = m * dsub
    mat = np.array(
        data.draw(
            st.lists(
                st.lists(finite, min_size=dim, max_size=dim),
                min_size=n, max_size=n,
            )
        )
    )
    books = np.array(
        data.draw(
            st.lists(
                st.lists(
                    st.lists(finite, min_size=dsub, max_size=dsub),
                    min_size=k, max_size=k,
                ),
                min_size=m, max_size=m,
            )
        )
    )
    codes = _encode_matrix(mat, books)
    assert codes.shape == (n, m)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        d = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        for i in range(n):
            chosen = codes[i, s]
            assert 0 <= chosen < k
            # optimal: no centroid strictly beats the chosen one
            # (compare via the same expansion the kernel uses, which
            # drops the ||x||^2 term — mathematically equal ranks but
            # different float rounding than the direct form, so assert
            # against the kernel's own objective)
            obj = -2.0 * (sub[i] @ books[s].T) + (books[s] ** 2).sum(axis=1)
            best = obj.min()
            assert obj[chosen] == best
            # ties break to the LOWEST code id (np.argmin contract)
            assert chosen == int(np.flatnonzero(obj == best)[0])


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(finite, min_size=3, max_size=3), min_size=1, max_size=20
    )
)
def test_normalize_rows_unit_or_zero(rows):
    mat = np.array(rows)
    out = _normalize_rows(mat)
    norms = np.linalg.norm(out, axis=1)
    src = np.linalg.norm(mat, axis=1)
    for i in range(len(rows)):
        if src[i] == 0:
            assert norms[i] == 0  # zero rows stay zero, no NaN
        else:
            # denormal-magnitude rows (hypothesis found 2.9e-159)
            # normalize with ~5e-8 relative error — inherent float
            # division precision, not an operator defect
            assert abs(norms[i] - 1.0) < 1e-6
