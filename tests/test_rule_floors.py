"""HC rule-dataset model-quality floors (RealTimeRuleModelPerfIT.java:
29-41): the reference's own labeled 2-entity dataset (10-min intervals,
sum(visitCount) feature, ignore_anomaly margin rules) must clear
precision ≥ 0.5 / 0.5 and window-recall ≥ 0.7 / 0.3 (Phoenix /
Scottsdale).  Run through the real detector surface: suppression
rules + previous-value imputation + the seasonal z-score scorer in the
pluggable seam (the trailing z-score stand-in cannot model this
dataset's diurnal+weekly seasonality with trend — measured precision
~0 — which is exactly the data point motivating the seasonal scorer)."""

import os

import pytest

from scripts.run_rule_floors import RULE_DATA, evaluate

FLOORS = {  # entity: (min precision, min window recall)
    "Phoenix": (0.5, 0.7),
    "Scottsdale": (0.5, 0.3),
}


@pytest.mark.skipif(not os.path.exists(RULE_DATA),
                    reason="reference rule dataset not mounted")
def test_rule_dataset_floors(spark):
    out = evaluate(spark)
    assert set(out) == set(FLOORS)
    for ent, (min_p, min_r) in FLOORS.items():
        got = out[ent]
        assert got["precision"] >= min_p, (ent, got)
        assert got["recall"] >= min_r, (ent, got)
