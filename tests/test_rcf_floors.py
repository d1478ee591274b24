"""All three reference model-quality floors with the RCF scorer, run
through the engine's own surfaces (preview / run_historical) over the
reference's own labeled datasets:

- SingleStreamModelPerfIT.java:51  — synthetic.data, P>=0.4, R>=0.7
- RealTimeRuleModelPerfIT.java:33-41 — rule.data via preview + margin
  rules: Phoenix 0.5/0.7, Scottsdale 0.5/0.3
- HistoricalRuleModelPerfIT.java:33-42 — rule.data via run_historical
  (checkpointable RCF stream in the scorer seam): Phoenix 0.4/0.9,
  Scottsdale 0.5/0.3

Measured values are recorded in BASELINE.md; these tests assert the
reference's floors, not the measured points, so model-neutral jitter
(there is none — the scorer is seeded) cannot flake them.
"""

import os

import pytest

from scripts.run_rcf_floors import (
    RULE_DATA,
    SYN_DATA,
    evaluate_rule_historical,
    evaluate_rule_realtime,
    evaluate_single_stream,
)

REALTIME_FLOORS = {"Phoenix": (0.5, 0.7), "Scottsdale": (0.5, 0.3)}
HISTORICAL_FLOORS = {"Phoenix": (0.4, 0.9), "Scottsdale": (0.5, 0.3)}


@pytest.mark.skipif(not os.path.exists(SYN_DATA),
                    reason="reference synthetic dataset not mounted")
def test_single_stream_floor_rcf(spark):
    got = evaluate_single_stream(spark)
    assert got["precision"] >= 0.4, got
    assert got["recall"] >= 0.7, got


@pytest.mark.skipif(not os.path.exists(SYN_DATA),
                    reason="reference synthetic dataset not mounted")
def test_single_stream_floor_rcf_joint(spark):
    # the reference's exact model shape: ONE forest over the jointly
    # shingled 2-feature vector
    got = evaluate_single_stream(spark, joint=True)
    assert got["precision"] >= 0.4, got
    assert got["recall"] >= 0.7, got


@pytest.mark.skipif(not os.path.exists(RULE_DATA),
                    reason="reference rule dataset not mounted")
def test_rule_realtime_floor_rcf(spark):
    out = evaluate_rule_realtime(spark)
    assert set(out) == set(REALTIME_FLOORS)
    for ent, (min_p, min_r) in REALTIME_FLOORS.items():
        got = out[ent]
        assert got["precision"] >= min_p, (ent, got)
        assert got["recall"] >= min_r, (ent, got)


@pytest.mark.skipif(not os.path.exists(RULE_DATA),
                    reason="reference rule dataset not mounted")
def test_rule_historical_floor_rcf(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("rcf_hist"))
    out = evaluate_rule_historical(spark, wd)
    assert set(out) == set(HISTORICAL_FLOORS)
    for ent, (min_p, min_r) in HISTORICAL_FLOORS.items():
        got = out[ent]
        assert got["precision"] >= min_p, (ent, got)
        assert got["recall"] >= min_r, (ent, got)
