#!/usr/bin/env python
"""All three reference model-quality floors with the RCF scorer.

The reference asserts per-dataset precision / window-recall floors in
three perf ITs, all against its ThresholdedRandomCutForest models:

- ``SingleStreamModelPerfIT.java:51`` — synthetic.data (1-min
  intervals, 2 features, trainTestSplit 1500): P >= 0.4, R >= 0.7.
- ``RealTimeRuleModelPerfIT.java:33-41`` — rule.data (2 entities,
  10-min, margin suppression rules): Phoenix 0.5/0.7,
  Scottsdale 0.5/0.3.
- ``HistoricalRuleModelPerfIT.java:33-42`` — same dataset through the
  historical (batch) runner: Phoenix 0.4/0.9, Scottsdale 0.5/0.3.

This script runs the engine's OWN surfaces — ``preview`` for the two
realtime floors, ``run_historical`` (with the checkpointable RCF
stream in its scorer seam) for the historical one — over the
reference's own labeled datasets, read at runtime from the read-only
reference checkout.  The RCF config is the reduced-but-documented
30 trees x 128 samples (reference defaults 50 x 256 — the floors pass
at either; the reduced config keeps the test suite's wall time sane).

Results are recorded in BASELINE.md and locked by
tests/test_rcf_floors.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = "/root/reference/src/test/resources/org/opensearch/ad/e2e/data"
RULE_DATA = f"{DATA_DIR}/rule.data"
RULE_LABEL = f"{DATA_DIR}/rule.label"
SYN_DATA = f"{DATA_DIR}/synthetic.data"
SYN_LABEL = f"{DATA_DIR}/synthetic.label"

RCF_CONF = dict(shingle=8, n_trees=30, sample_size=128)


def _window_metrics(res, wins, interval_ms, test_start):
    """positives/TP/window-recall, the perf ITs' exact accounting."""
    import pandas as pd

    pos = res[(res.anomaly_grade > 0)
              & (res.bucket_start.map(pd.Timestamp) >= test_start)]
    tp, found = 0, set()
    for b in pos.bucket_start.map(pd.Timestamp):
        end = b + pd.Timedelta(milliseconds=interval_ms)
        for i, (a, z) in enumerate(wins):
            if b <= z and end >= a:
                tp += 1
                found.add(i)
                break
    return {"positives": int(len(pos)), "tp": tp,
            "precision": round(tp / max(len(pos), 1), 3),
            "recall": round(len(found) / len(wins), 3),
            "windows": len(wins)}


def _windows(raw):
    import pandas as pd

    return [(pd.Timestamp(a).tz_localize(None),
             pd.Timestamp(b).tz_localize(None)) for a, b in raw]


def evaluate_single_stream(spark, margin_conf: dict | None = None,
                           joint: bool = False):
    """SingleStreamModelPerfIT: synthetic.data through preview.

    ``joint=True`` scores the two features with ONE forest over the
    jointly shingled vector — the reference's exact model shape for
    this dataset; the default scores per feature and max-combines."""
    import pandas as pd

    from anomaly_detection_spark.detector import Detector, preview
    from anomaly_detection_spark.features import rcf_scorer, rcf_scorer_joint

    interval_ms = 60_000
    data = pd.DataFrame(json.load(open(SYN_DATA)))
    data["ts"] = pd.to_datetime(data["timestamp"]).dt.tz_localize(None)
    src = "/tmp/adspark_syn_data"
    spark.createDataFrame(data[["ts", "Feature1", "Feature2"]]) \
        .write.mode("overwrite").parquet(src)

    det = Detector(
        detector_id="syn-ss", indices=src,
        feature_specs={"f1": {"sum": {"field": "Feature1"}},
                       "f2": {"sum": {"field": "Feature2"}}},
        time_field="ts", interval_ms=interval_ms,
        anomaly_threshold=3.0)
    conf = margin_conf or RCF_CONF
    scorer = rcf_scorer_joint(2, **conf) if joint else rcf_scorer(**conf)
    res = preview(spark, det, scorer=scorer).toPandas()
    wins = _windows(json.load(open(SYN_LABEL)))
    test_start = data["ts"].min() + pd.Timedelta(
        milliseconds=1500 * interval_ms)
    return _window_metrics(res, wins, interval_ms, test_start)


def evaluate_rule_realtime(spark, margin: float = 3000.0):
    """RealTimeRuleModelPerfIT: rule.data through preview + rules."""
    import pandas as pd

    from anomaly_detection_spark.detector import Detector, preview
    from anomaly_detection_spark.features import rcf_scorer

    interval_ms = 600_000
    data = pd.DataFrame(json.load(open(RULE_DATA)))
    labels = json.load(open(RULE_LABEL))
    data["ts"] = pd.to_datetime(data["timestamp"], unit="ms")
    src = "/tmp/adspark_rule_data_rcf"
    spark.createDataFrame(data[["cityName", "ts", "visitCount"]]) \
        .write.mode("overwrite").parquet(src)

    det = Detector(
        detector_id="rule-rcf", indices=src,
        feature_specs={"f1": {"sum": {"field": "visitCount"}}},
        time_field="ts", interval_ms=interval_ms,
        category_fields=("cityName",),
        imputation_method="previous",
        anomaly_threshold=3.0,
        suppression_rules=(
            {"action": "ignore_anomaly", "conditions": [
                {"feature_name": "f1",
                 "threshold_type": "actual_over_expected_margin",
                 "operator": "lte", "value": margin},
                {"feature_name": "f1",
                 "threshold_type": "expected_over_actual_margin",
                 "operator": "lte", "value": margin}]},
        ))
    res = preview(spark, det, scorer=rcf_scorer(**RCF_CONF)).toPandas()
    t0 = int(data["timestamp"].min())
    test_start = pd.Timestamp(t0 + 1500 * interval_ms, unit="ms")
    return {ent: _window_metrics(res[res.cityName == ent],
                                 _windows(wins), interval_ms, test_start)
            for ent, wins in labels.items()}


def evaluate_rule_historical(spark, work_dir: str, margin: float = 3000.0):
    """HistoricalRuleModelPerfIT: rule.data through run_historical with
    the checkpointable RCF stream in the scorer seam."""
    import pandas as pd

    from anomaly_detection_spark.detector import Detector, run_historical
    from anomaly_detection_spark.features import rcf_stream_factory

    interval_ms = 600_000
    data = pd.DataFrame(json.load(open(RULE_DATA)))
    labels = json.load(open(RULE_LABEL))
    data["ts"] = pd.to_datetime(data["timestamp"], unit="ms")
    src = "/tmp/adspark_rule_data_rcf"
    spark.createDataFrame(data[["cityName", "ts", "visitCount"]]) \
        .write.mode("overwrite").parquet(src)

    det = Detector(
        detector_id="rule-rcf-hist", indices=src,
        feature_specs={"f1": {"sum": {"field": "visitCount"}}},
        time_field="ts", interval_ms=interval_ms,
        category_fields=("cityName",),
        anomaly_threshold=3.0,
        suppression_rules=(
            {"action": "ignore_anomaly", "conditions": [
                {"feature_name": "f1",
                 "threshold_type": "actual_over_expected_margin",
                 "operator": "lte", "value": margin},
                {"feature_name": "f1",
                 "threshold_type": "expected_over_actual_margin",
                 "operator": "lte", "value": margin}]},
        ))
    start_ms = int(data["timestamp"].min())
    end_ms = int(data["timestamp"].max()) + interval_ms
    res = run_historical(
        spark, det, start_ms, end_ms,
        state_dir=os.path.join(work_dir, "state"),
        results_dir=os.path.join(work_dir, "results"),
        piece_intervals=4096,
        scorer_factory=rcf_stream_factory(**RCF_CONF)).toPandas()
    test_start = pd.Timestamp(start_ms + 1500 * interval_ms, unit="ms")
    return {ent: _window_metrics(res[res.cityName == ent],
                                 _windows(wins), interval_ms, test_start)
            for ent, wins in labels.items()}


def main():
    if not os.path.exists(RULE_DATA):
        print("reference datasets not available; skipping")
        return 0
    import tempfile

    from anomaly_detection_spark.session import get_spark

    spark = get_spark("rcf-floors", master="local[8]", shuffle_partitions=8)
    out = {
        "rcf_conf": RCF_CONF,
        "single_stream": evaluate_single_stream(spark),
        "rule_realtime": evaluate_rule_realtime(spark),
        "rule_historical": evaluate_rule_historical(
            spark, tempfile.mkdtemp(prefix="adspark_rcf_hist_")),
    }
    print(json.dumps(out, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
