"""BWC: ingest the reference's AD-1.x RCF checkpoint format
(sample-set reconstruction, the reference's own migration posture)."""

import json
import math
import os
import random

import pytest

from anomaly_detection_spark.features.rcf import (StreamingRCF,
                                                  ingest_v1_checkpoint)

REF_CKPT = ("/root/reference/src/test/resources/org/opensearch/ad/ml/"
            "rcf_1_0_checkpoint.json")


def _synthetic_ckpt(n_trees=4, sample_size=32, dims=2, seed=5):
    """A v1-format checkpoint built in code (same schema as the
    reference fixture) around a known 2-D Gaussian blob."""
    rng = random.Random(seed)
    updaters = []
    seq = 0
    for _ in range(n_trees):
        samples = []
        for _ in range(sample_size):
            seq += 1
            u = rng.random()
            samples.append({
                "point": [rng.gauss(10.0, 0.5), rng.gauss(-3.0, 0.5)],
                "weight": math.log(-math.log(u)) - 1e-4 * seq,
                "sequenceIndex": seq,
            })
        updaters.append({"sampler": {"weightedSamples": samples}})
    rcf = {"dimensions": dims, "sampleSize": sample_size,
           "outputAfter": sample_size // 2, "numberOfTrees": n_trees,
           "lambda": 1e-4,
           "executor": {"executor_type": "SequentialForestTraversalExecutor",
                        "executor": {"treeUpdaters": updaters}}}
    return {"sp": [[10.1, -3.1], [9.9, -2.9]], "rcf": json.dumps(rcf)}


def test_ingest_synthetic_v1_format():
    ck = _synthetic_ckpt()
    forest, sp = ingest_v1_checkpoint(json.dumps(ck))
    assert isinstance(forest, StreamingRCF)
    assert sp == [(10.1, -3.1), (9.9, -2.9)]
    assert forest.n_trees == 4 and forest.sample_size == 32
    # every tree carries exactly the checkpoint's sample mass
    assert all(t.total_mass == 32 for t in forest.trees)
    assert forest.seq == 4 * 32 + 1
    # the restored model separates inliers from outliers immediately
    s_in, _ = forest.score((10.0, -3.0))
    s_out, _ = forest.score((30.0, 20.0))
    assert s_out > 2 * s_in > 0
    # and keeps evolving: updates don't grow past the sample budget
    for i in range(100):
        forest.update((10.0 + 0.01 * i, -3.0))
    assert all(len(h) == 32 for h in forest.heaps)
    assert all(t.total_mass == 32 for t in forest.trees)


def test_ingest_rejects_dim_mismatch():
    ck = _synthetic_ckpt()
    inner = json.loads(ck["rcf"])
    inner["dimensions"] = 3
    ck["rcf"] = json.dumps(inner)
    with pytest.raises(ValueError, match="dimension"):
        ingest_v1_checkpoint(ck)


@pytest.mark.skipif(not os.path.exists(REF_CKPT),
                    reason="reference checkout not present")
def test_ingest_reference_fixture():
    with open(REF_CKPT) as f:
        raw = f.read()
    forest, sp = ingest_v1_checkpoint(raw)
    meta = json.loads(json.loads(raw)["rcf"])
    assert forest.n_trees == meta["numberOfTrees"]
    assert forest.dims == meta["dimensions"]
    per_tree = [t.total_mass for t in forest.trees]
    want = [len(u["sampler"]["weightedSamples"])
            for u in meta["executor"]["executor"]["treeUpdaters"]]
    assert per_tree == want
    # the fixture's samples are U[0,1] draws — a far point scores
    # clearly above an in-range one on the restored model
    s_in, _ = forest.score((0.5,))
    s_out, _ = forest.score((8.0,))
    assert s_out > s_in > 0
