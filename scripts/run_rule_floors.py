#!/usr/bin/env python
"""HC rule-dataset quality floors (RealTimeRuleModelPerfIT.java:29-41).

Runs the engine's detector surface (z-score stand-in + the reference's
margin suppression rules) over the reference's own labeled HC dataset
(2 entities, 10-minute intervals, visitCount sum feature, labeled
anomaly windows) and reports per-entity precision / window-recall
against the reference's floors: precision ≥ 0.5 / 0.5, recall ≥ 0.7 /
0.3 (Phoenix / Scottsdale).  Results are recorded in BASELINE.md and
locked by tests/test_rule_floors.py.

The dataset is read from the read-only reference checkout at runtime
(test resources, not code); nothing is copied into this repo.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RULE_DATA = ("/root/reference/src/test/resources/org/opensearch/ad/"
             "e2e/data/rule.data")
RULE_LABEL = ("/root/reference/src/test/resources/org/opensearch/ad/"
              "e2e/data/rule.label")
INTERVAL_MS = 10 * 60_000
TRAIN_SPLIT = 1500          # intervals per entity, like verifyRule


def evaluate(spark, margin: float = 3000.0, z_threshold: float = 5.0):
    import pandas as pd

    from anomaly_detection_spark.detector import Detector, preview
    from anomaly_detection_spark.features import seasonal_zscore_scorer

    data = pd.DataFrame(json.load(open(RULE_DATA)))
    labels = json.load(open(RULE_LABEL))
    data["ts"] = pd.to_datetime(data["timestamp"], unit="ms")
    src = "/tmp/adspark_rule_data"
    spark.createDataFrame(data[["cityName", "ts", "visitCount"]]) \
        .write.mode("overwrite").parquet(src)

    det = Detector(
        detector_id="rule-hc", indices=src,
        feature_specs={"f1": {"sum": {"field": "visitCount"}}},
        time_field="ts", interval_ms=INTERVAL_MS,
        category_fields=("cityName",),
        # seasonal scorer needs a dense grid: carry missing intervals
        # forward (the dataset has a handful of gaps)
        imputation_method="previous",
        anomaly_threshold=z_threshold,
        suppression_rules=(
            {"action": "ignore_anomaly", "conditions": [
                {"feature_name": "f1",
                 "threshold_type": "actual_over_expected_margin",
                 "operator": "lte", "value": margin},
                {"feature_name": "f1",
                 "threshold_type": "expected_over_actual_margin",
                 "operator": "lte", "value": margin}]},
        ))
    # weekly seasonality at 10-minute cadence: period = 1008 buckets;
    # median of 4 weeks, residual window 2 days
    scorer = seasonal_zscore_scorer(period=1008, n_periods=4,
                                    resid_window=288, min_periods=72)
    res = preview(spark, det, scorer=scorer).toPandas()

    t0 = int(data["timestamp"].min())
    test_start = pd.Timestamp(t0 + TRAIN_SPLIT * INTERVAL_MS, unit="ms")
    out = {}
    for ent, wins in labels.items():
        windows = [(pd.Timestamp(a), pd.Timestamp(b)) for a, b in wins]
        windows = [(a.tz_localize(None), b.tz_localize(None))
                   for a, b in windows]
        r = res[(res.cityName == ent)
                & (res.bucket_start.map(pd.Timestamp) >= test_start)]
        pos = r[r.anomaly_grade > 0]
        tp, found = 0, set()
        for b in pos.bucket_start.map(pd.Timestamp):
            end = b + pd.Timedelta(milliseconds=INTERVAL_MS)
            for i, (a, z) in enumerate(windows):
                if b <= z and end >= a:
                    tp += 1
                    found.add(i)
                    break
        precision = tp / max(len(pos), 1)
        recall = len(found) / len(windows)
        out[ent] = {"positives": int(len(pos)), "tp": tp,
                    "precision": round(precision, 3),
                    "recall": round(recall, 3),
                    "windows": len(windows)}
    return out


def main():
    if not os.path.exists(RULE_DATA):
        print("rule.data not available; skipping")
        return 0
    from anomaly_detection_spark.session import get_spark

    spark = get_spark("rule-floors", master="local[8]",
                      shuffle_partitions=8)
    out = evaluate(spark)
    print(json.dumps({"scorer": "seasonal_zscore(period=1008, median-4w)",
                      "z_threshold": 5.0, "margin": 3000.0,
                      "entities": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
