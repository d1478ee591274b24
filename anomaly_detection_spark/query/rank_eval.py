"""``_rank_eval`` analog: run rated search requests and score the
ranking quality — precision@k / recall@k / MRR / (N)DCG / ERR, the
five metrics the reference endpoint ships (RankEvalSpec; published
formulas restated at each helper).

Driver-side metric math over top-k hits (tiny — k rows per request);
the searches themselves run through :func:`~.planner.search`, so
every query kind the engine plans is evaluable."""

from __future__ import annotations

import math
from typing import Any


def _hits(target, request: dict[str, Any], k: int,
          text_field: str) -> list[int]:
    from .planner import search

    body = {**request, "size": k}
    body.setdefault("_source", False)
    rows = search(target, body, text_field=text_field).collect()
    return [r["docid"] for r in rows[:k]]


def _precision(ranked: list[int], ratings: dict[int, int],
               threshold: int, ignore_unlabeled: bool) -> float:
    rel = tot = 0
    for d in ranked:
        r = ratings.get(d)
        if r is None and ignore_unlabeled:
            continue
        tot += 1
        rel += (r or 0) >= threshold
    return rel / tot if tot else 0.0


def _recall(ranked: list[int], ratings: dict[int, int],
            threshold: int) -> float:
    all_rel = sum(1 for r in ratings.values() if r >= threshold)
    if not all_rel:
        return 0.0
    got = sum(1 for d in ranked if (ratings.get(d) or 0) >= threshold)
    return got / all_rel


def _mrr(ranked: list[int], ratings: dict[int, int],
         threshold: int) -> float:
    for i, d in enumerate(ranked):
        if (ratings.get(d) or 0) >= threshold:
            return 1.0 / (i + 1)
    return 0.0


def _dcg(ranked: list[int], ratings: dict[int, int],
         normalize: bool) -> float:
    def dcg_of(rs: list[int]) -> float:
        return sum((2 ** r - 1) / math.log2(i + 2)
                   for i, r in enumerate(rs))

    got = dcg_of([ratings.get(d) or 0 for d in ranked])
    if not normalize:
        return got
    ideal = dcg_of(sorted(ratings.values(), reverse=True)[:len(ranked)])
    return got / ideal if ideal > 0 else 0.0


def _err(ranked: list[int], ratings: dict[int, int],
         max_rel: int) -> float:
    # Expected Reciprocal Rank (Chapelle et al. 2009, the formula the
    # reference cites): R_i = (2^g − 1)/2^g_max; ERR = Σ 1/i · R_i ·
    # Π_{j<i}(1 − R_j)
    err = 0.0
    p_look = 1.0
    for i, d in enumerate(ranked):
        r = (2 ** (ratings.get(d) or 0) - 1) / (2 ** max_rel)
        err += p_look * r / (i + 1)
        p_look *= 1.0 - r
    return err


def rank_eval(target, requests: list[dict[str, Any]],
              metric: dict[str, Any],
              text_field: str = "text") -> dict[str, Any]:
    """Evaluate rated requests: ``requests`` = [{"id", "request"
    (search body), "ratings": [{"_id", "rating"}]}], ``metric`` = one
    of {"precision"| "recall" | "mean_reciprocal_rank" | "dcg" |
    "expected_reciprocal_rank": {params}}.  Returns {"metric_score"
    (mean over requests), "details": {id: {"metric_score",
    "unrated_docs", "hits"}}}."""
    (mname, mp), = metric.items()
    if mname not in ("precision", "recall", "mean_reciprocal_rank",
                     "dcg", "expected_reciprocal_rank"):
        raise ValueError(f"unsupported rank_eval metric {mname!r}")
    k = int(mp.get("k", 10))
    thr = int(mp.get("relevant_rating_threshold", 1))
    details: dict[str, Any] = {}
    scores = []
    for req in requests:
        ratings = {int(r["_id"]): int(r["rating"])
                   for r in req.get("ratings", [])}
        ranked = _hits(target, req["request"], k, text_field)
        if mname == "precision":
            s = _precision(ranked, ratings, thr,
                           bool(mp.get("ignore_unlabeled", False)))
        elif mname == "recall":
            s = _recall(ranked, ratings, thr)
        elif mname == "mean_reciprocal_rank":
            s = _mrr(ranked, ratings, thr)
        elif mname == "dcg":
            s = _dcg(ranked, ratings, bool(mp.get("normalize", False)))
        elif mname == "expected_reciprocal_rank":
            s = _err(ranked, ratings,
                     int(mp.get("maximum_relevance", 4)))
        else:
            raise ValueError(f"unsupported rank_eval metric {mname!r}")
        scores.append(s)
        details[req.get("id", str(len(details)))] = {
            "metric_score": s,
            "unrated_docs": [d for d in ranked if d not in ratings],
            "hits": [{"docid": d, "rating": ratings.get(d)}
                     for d in ranked],
        }
    return {"metric_score": (sum(scores) / len(scores)
                             if scores else 0.0),
            "details": details}
