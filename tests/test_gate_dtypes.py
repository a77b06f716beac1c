"""The local correctness gate must be dtype-exact like the driver's
hasher (r4 escape: DuckDB HUGEINT sum -> pandas float64 ``67.0`` vs
Spark bigint ``67`` hashed differently while 6-dp value compare stayed
green).  These tests inject exactly that mismatch and assert the gate
now fails on it, plus the non-regression cases."""

import pandas as pd

from tools.check_correctness import compare_frames


def test_int_vs_float_dtype_flagged():
    spark_side = pd.DataFrame({"k": ["a", "b"], "total": pd.array([67, 3], dtype="int64")})
    oracle_side = pd.DataFrame({"k": ["a", "b"], "total": pd.array([67.0, 3.0], dtype="float64")})
    status = compare_frames(spark_side, oracle_side)
    assert status and any("dtype[total]" in s for s in status)


def test_identical_frames_pass():
    a = pd.DataFrame({"k": ["a", "b"], "v": [1.5, 2.5]})
    b = pd.DataFrame({"k": ["b", "a"], "v": [2.5, 1.5]})  # order-insensitive
    assert compare_frames(a, b) == []


def test_value_mismatch_still_flagged():
    a = pd.DataFrame({"v": [1.0, 2.0]})
    b = pd.DataFrame({"v": [1.0, 2.0000001]})
    # beyond 6-dp rounding -> equal; a real difference must flag
    c = pd.DataFrame({"v": [1.0, 2.5]})
    assert compare_frames(a, b) == []
    assert compare_frames(a, c)


def test_object_kind_not_overflagged():
    # DuckDB can hand back object-dtype columns (e.g. decimal.Decimal);
    # "other" vs numeric is not auto-failed — values still compare.
    a = pd.DataFrame({"v": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"v": pd.Series([1, 2], dtype="object")})
    assert compare_frames(a, b) == []
