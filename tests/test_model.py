"""Bucket-grid arithmetic and time parameter tests.

Cases ported from the reference's BucketsTest.java, BucketConfigTest /
TimeRangeTest semantics (SURVEY.md §5 layer 1).
"""

import pytest

from rhq_metrics_spark.model import (
    Buckets,
    TimeRange,
    parse_duration,
    parse_relative_time,
    time_slice,
)


class TestBucketsFromCount:
    def test_exact_division(self):
        assert Buckets.from_count(5, 10, 5) == Buckets(5, 1, 5)

    def test_count_step_below_range(self):
        assert Buckets.from_count(5, 10, 4) == Buckets(5, 1, 4)

    def test_count_step_above_range(self):
        # BucketsTest.java: fromCount(14, 40, 3) == (14, 9, 3)
        assert Buckets.from_count(14, 40, 3) == Buckets(14, 9, 3)

    def test_zero_step_rejected(self):
        with pytest.raises(ValueError, match="step is equal to zero"):
            Buckets.from_count(28, 37, (37 - 28) + 1)

    def test_bad_range(self):
        with pytest.raises(ValueError):
            Buckets.from_count(10, 10, 1)


class TestBucketsFromStep:
    def test_step_larger_than_range(self):
        assert Buckets.from_step(4, 43, 50) == Buckets(4, 50, 1)

    def test_exact(self):
        assert Buckets.from_step(11, 11 + 47 * 2734, 47) == Buckets(11, 47, 2734)

    def test_remainder_rounds_up(self):
        assert Buckets.from_step(5, 13, 7) == Buckets(5, 7, 2)

    def test_too_many_buckets(self):
        with pytest.raises(ValueError, match="too big"):
            Buckets.from_step(0, 2**63 - 1, 1)


class TestTimeParams:
    def test_duration_parse(self):
        assert parse_duration("150ms") == 150
        assert parse_duration("30s") == 30_000
        assert parse_duration("5mn") == 300_000
        assert parse_duration("2h") == 7_200_000
        assert parse_duration("7d") == 604_800_000
        with pytest.raises(ValueError):
            parse_duration("5m")  # minutes are 'mn' in the reference

    def test_relative(self):
        now = 1_000_000_000
        assert parse_relative_time("+2h", now) == now + 7_200_000
        assert parse_relative_time("-8h", now) == now - 7_200_000 * 4
        assert parse_relative_time("12345", now) == 12345
        assert parse_relative_time(777, now) == 777

    def test_defaults_now_minus_8h(self):
        now = 9_000_000_000
        tr = TimeRange.of(now_ms=now)
        assert tr.end == now
        assert tr.start == now - 8 * 3_600_000

    def test_invalid_range(self):
        with pytest.raises(ValueError):
            TimeRange.of(start=10, end=10, now_ms=100)

    def test_time_slice(self):
        two_h = 7_200_000
        assert time_slice(two_h + 1, two_h) == two_h
        assert time_slice(two_h, two_h) == two_h
        assert time_slice(two_h - 1, two_h) == 0


class TestBucketConfig:
    """REST BucketConfig contract (BucketConfig.java:36-72, ErrorsITest)."""

    def test_count_path(self):
        from rhq_metrics_spark.model import bucket_config

        b = bucket_config(TimeRange(0, 600_000), buckets=10)
        assert b.count == 10

    def test_duration_path(self):
        from rhq_metrics_spark.model import bucket_config

        b = bucket_config(TimeRange(0, 600_000), bucket_duration="1mn")
        assert b.step == 60_000 and b.count == 10

    def test_both_rejected(self):
        from rhq_metrics_spark.model import bucket_config

        with pytest.raises(ValueError, match="both"):
            bucket_config(TimeRange(0, 1000), buckets=5, bucket_duration="1s")

    def test_neither_rejected(self):
        from rhq_metrics_spark.model import bucket_config

        with pytest.raises(ValueError, match="required"):
            bucket_config(TimeRange(0, 1000))
