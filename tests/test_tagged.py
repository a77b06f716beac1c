"""A5 group-by-tag stats — point-tag filters + tag-combination grouping."""

import pytest

from rhq_metrics_spark.operators import tagged_stats

T0 = 1_700_000_000_000


@pytest.fixture(scope="module")
def tagged_df(gauge_points_factory):
    rows = [
        ("t1", "m", T0 + 0, 1.0, {"dc": "dc1", "env": "prod"}),
        ("t1", "m", T0 + 1000, 2.0, {"dc": "dc1", "env": "stage"}),
        ("t1", "m", T0 + 2000, 3.0, {"dc": "dc2", "env": "prod"}),
        ("t1", "m", T0 + 3000, 4.0, {"dc": "dc2", "env": "prod"}),
        ("t1", "m", T0 + 4000, 5.0, {"env": "prod"}),  # no dc → filtered out
        ("t1", "m", T0 + 5000, 6.0, None),
    ]
    return gauge_points_factory(rows)


def test_group_by_tag_combination(tagged_df):
    out = {
        (r["tag_dc"], r["tag_env"]): r
        for r in tagged_stats(tagged_df, {"dc": "*", "env": "*"}).collect()
    }
    assert set(out) == {("dc1", "prod"), ("dc1", "stage"), ("dc2", "prod")}
    assert out[("dc2", "prod")]["samples"] == 2
    assert out[("dc2", "prod")]["avg"] == pytest.approx(3.5)


def test_regex_tag_filter(tagged_df):
    out = tagged_stats(tagged_df, {"dc": "dc1|dc2", "env": "prod"}).collect()
    assert sum(r["samples"] for r in out) == 3


def test_negated_tag_filter(tagged_df):
    out = tagged_stats(tagged_df, {"env": "!prod"}).collect()
    assert len(out) == 1 and out[0]["tag_env"] == "stage"


def test_full_match_anchoring(tagged_df):
    # Java matches(): 'pro' must NOT match 'prod'
    assert tagged_stats(tagged_df, {"env": "pro"}).count() == 0
    assert tagged_stats(tagged_df, {"env": "pro.*"}).count() > 0
