"""Hypothesis property tests for the qt codec laws (SURVEY §5.1)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from osmquadtree_depreceated_ray.functions import quadtree as qt


def valid_qt(x, y, level):
    return int(qt.qt_from_tuple(np.asarray([x % (1 << level)]),
                                np.asarray([y % (1 << level)]),
                                np.asarray([level]))[0])


@given(st.integers(0, (1 << 18) - 1), st.integers(0, (1 << 18) - 1),
       st.integers(0, 18))
@settings(max_examples=200, deadline=None)
def test_string_tuple_roundtrip(x, y, level):
    v = valid_qt(x, y, level)
    s = qt.qt_to_string(np.asarray([v]))[0]
    assert len(s) == level
    assert qt.qt_from_string(s) == v
    tx, ty, tz = qt.qt_tuple(np.asarray([v]))
    assert int(tz[0]) == level
    back = int(qt.qt_from_tuple(tx, ty, tz)[0])
    assert back == v


@given(st.integers(0, (1 << 18) - 1), st.integers(0, (1 << 18) - 1),
       st.integers(0, 18), st.integers(0, 18))
@settings(max_examples=200, deadline=None)
def test_round_laws(x, y, level, to):
    v = valid_qt(x, y, level)
    r = int(qt.qt_round(np.asarray([v]), to)[0])
    if to >= level:
        assert r == v  # rounding to deeper level is identity
    else:
        assert (r & 31) == to
        # idempotent + ancestor-of relation
        assert int(qt.qt_round(np.asarray([r]), to)[0]) == r
        assert int(qt.qt_round(np.asarray([v]), to)[0]) == r


@given(st.integers(0, (1 << 18) - 1), st.integers(0, (1 << 18) - 1),
       st.integers(0, 18), st.integers(0, (1 << 18) - 1),
       st.integers(0, (1 << 18) - 1), st.integers(0, 18))
@settings(max_examples=200, deadline=None)
def test_common_is_shared_ancestor(x1, y1, l1, x2, y2, l2):
    a = valid_qt(x1, y1, l1)
    b = valid_qt(x2, y2, l2)
    c = int(qt.qt_common(np.asarray([a]), np.asarray([b]))[0])
    cl = c & 31
    assert cl <= min(l1, l2)
    assert int(qt.qt_round(np.asarray([a]), cl)[0]) == c
    assert int(qt.qt_round(np.asarray([b]), cl)[0]) == c
    # commutative
    assert int(qt.qt_common(np.asarray([b]), np.asarray([a]))[0]) == c
