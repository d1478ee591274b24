"""Streaming Random Cut Forest scorer — the reference's model family,
re-implemented from the published algorithm.

The reference scores every (entity, interval) feature point with a
ThresholdedRandomCutForest (``ADModelManager.java:272-298``) configured
by ``TimeSeriesSettings.java:195-205``: NUM_TREES=50,
NUM_SAMPLES_PER_TREE=256, recency emphasis 10·256 (time-decayed
reservoir), NUM_MIN_SAMPLES=32, shingle size 8.  This module implements
that model from public knowledge only — the RRCF insert/delete/score
algorithms of Guha, Mishra, Roy, Schrijvers, "Robust Random Cut Forest
Based Anomaly Detection on Streams" (ICML 2016) — with the
expected-inverse-depth scoring shape the OpenSearch model uses
(separation-probability traversal, unseen score 1/(depth+1), seen
score damped by duplicate mass, normalized by log2(tree mass)), and a
streaming thresholder that turns raw scores into the z-like values the
detector surface grades (BasicThresholder analog: discounted deviation
of the score sequence).

Everything is per-entity sequential state driven from inside the
``score_entities`` ``applyInPandas`` seam — one pandas batch per
entity, plain-Python tree ops (the model is a few hundred nodes; numpy
per-node would be slower than scalars), no per-row Python touching
Spark rows.
"""

from __future__ import annotations

import heapq
import math
import pickle
import random

import numpy as np

__all__ = ["RandomCutTree", "StreamingRCF", "rcf_scorer", "RCFStream",
           "rcf_stream_factory", "rcf_scorer_joint"]
# RCFStream.extrapolate + StreamingRCF.impute back the RCFCaster-style
# forecaster in anomaly_detection_spark.forecast.rcf_forecaster.


class RandomCutTree:
    """One random-cut tree over points of fixed dimension.

    Flat parallel-list storage; node ids are list indices with a free
    list.  Leaves carry ``point`` (tuple) + duplicate ``mass``;
    internal nodes carry the random cut (dim, value) and the bounding
    box of their subtree.  Insert/delete follow the RRCF paper's
    InsertPoint/ForgetPoint, which keep the tree distributed as if
    freshly built on the current sample.
    """

    __slots__ = ("dims", "rng", "left", "right", "parent", "cutdim",
                 "cutval", "bbmin", "bbmax", "point", "mass", "root",
                 "free")

    def __init__(self, dims: int, rng: random.Random):
        self.dims = dims
        self.rng = rng
        self.left: list[int] = []
        self.right: list[int] = []
        self.parent: list[int] = []
        self.cutdim: list[int] = []
        self.cutval: list[float] = []
        self.bbmin: list[list[float]] = []
        self.bbmax: list[list[float]] = []
        self.point: list[tuple | None] = []
        self.mass: list[int] = []
        self.root = -1
        self.free: list[int] = []

    # -- node allocation ---------------------------------------------------

    def _new_node(self) -> int:
        if self.free:
            return self.free.pop()
        self.left.append(-1)
        self.right.append(-1)
        self.parent.append(-1)
        self.cutdim.append(-1)
        self.cutval.append(0.0)
        self.bbmin.append([0.0] * self.dims)
        self.bbmax.append([0.0] * self.dims)
        self.point.append(None)
        self.mass.append(0)
        return len(self.left) - 1

    def _new_leaf(self, p: tuple, parent: int) -> int:
        nid = self._new_node()
        self.point[nid] = p
        self.mass[nid] = 1
        self.parent[nid] = parent
        self.left[nid] = -1
        self.bbmin[nid] = list(p)
        self.bbmax[nid] = list(p)
        return nid

    @property
    def total_mass(self) -> int:
        return self.mass[self.root] if self.root >= 0 else 0

    # -- insert ------------------------------------------------------------

    def insert(self, p: tuple) -> int:
        """RRCF InsertPoint; returns the leaf id holding ``p``."""
        if self.root < 0:
            self.root = self._new_leaf(p, -1)
            return self.root
        rng_random = self.rng.random
        node = self.root
        while True:
            bmin, bmax = self.bbmin[node], self.bbmax[node]
            # merged bbox span of (node subtree ∪ p)
            total = 0.0
            for d in range(self.dims):
                lo = bmin[d] if bmin[d] < p[d] else p[d]
                hi = bmax[d] if bmax[d] > p[d] else p[d]
                total += hi - lo
            if total <= 0.0:
                # identical point (only reachable at a leaf): duplicate
                # mass, like the reference's sequential points
                n = node
                while n >= 0:
                    self.mass[n] += 1
                    n = self.parent[n]
                return node
            # draw the random cut over the merged box (uniform along
            # the summed side lengths, per the paper)
            r = rng_random() * total
            cutd, cutv = -1, 0.0
            acc = 0.0
            for d in range(self.dims):
                lo = bmin[d] if bmin[d] < p[d] else p[d]
                hi = bmax[d] if bmax[d] > p[d] else p[d]
                w = hi - lo
                if r <= acc + w or d == self.dims - 1:
                    cutd = d
                    cutv = lo + (r - acc)
                    if cutv >= hi:      # float edge: clamp inside
                        cutv = hi - 1e-12 * (1.0 + abs(hi))
                    break
                acc += w
            if cutv < bmin[cutd] or cutv >= bmax[cutd]:
                # the cut separates p from the node's box → new parent
                # here (paper: the displayed tree is as if p had been
                # in the sample all along)
                newp = self._new_node()
                leaf = self._new_leaf(p, newp)
                self.cutdim[newp] = cutd
                self.cutval[newp] = cutv
                self.point[newp] = None
                old_parent = self.parent[node]
                if p[cutd] <= cutv:
                    self.left[newp], self.right[newp] = leaf, node
                else:
                    self.left[newp], self.right[newp] = node, leaf
                self.parent[newp] = old_parent
                self.parent[node] = newp
                nbmin, nbmax = self.bbmin[newp], self.bbmax[newp]
                for d in range(self.dims):
                    nbmin[d] = bmin[d] if bmin[d] < p[d] else p[d]
                    nbmax[d] = bmax[d] if bmax[d] > p[d] else p[d]
                self.mass[newp] = self.mass[node] + 1
                if old_parent < 0:
                    self.root = newp
                else:
                    if self.left[old_parent] == node:
                        self.left[old_parent] = newp
                    else:
                        self.right[old_parent] = newp
                    # grow ancestor boxes / masses
                    n = old_parent
                    while n >= 0:
                        self.mass[n] += 1
                        abmin, abmax = self.bbmin[n], self.bbmax[n]
                        for d in range(self.dims):
                            if p[d] < abmin[d]:
                                abmin[d] = p[d]
                            elif p[d] > abmax[d]:
                                abmax[d] = p[d]
                        n = self.parent[n]
                return leaf
            # no separation: descend along the node's existing cut
            # (bbox/mass grow on the way down; leaf case never reaches
            # here because a differing point always separates from a
            # zero-volume box)
            child = (self.left[node] if p[self.cutdim[node]]
                     <= self.cutval[node] else self.right[node])
            node = child

    # -- delete ------------------------------------------------------------

    def delete(self, leaf: int) -> None:
        """RRCF ForgetPoint for the point at ``leaf``."""
        if self.mass[leaf] > 1:
            n = leaf
            while n >= 0:
                self.mass[n] -= 1
                n = self.parent[n]
            return
        parent = self.parent[leaf]
        if parent < 0:                    # tree had exactly this leaf
            self.root = -1
            self.free.append(leaf)
            return
        sib = (self.right[parent] if self.left[parent] == leaf
               else self.left[parent])
        grand = self.parent[parent]
        self.parent[sib] = grand
        if grand < 0:
            self.root = sib
        else:
            if self.left[grand] == parent:
                self.left[grand] = sib
            else:
                self.right[grand] = sib
            # shrink ancestor boxes: recompute as union of children
            n = grand
            while n >= 0:
                self.mass[n] -= 1
                l_, r_ = self.left[n], self.right[n]
                lbmin, lbmax = self.bbmin[l_], self.bbmax[l_]
                rbmin, rbmax = self.bbmin[r_], self.bbmax[r_]
                nbmin, nbmax = self.bbmin[n], self.bbmax[n]
                for d in range(self.dims):
                    nbmin[d] = lbmin[d] if lbmin[d] < rbmin[d] else rbmin[d]
                    nbmax[d] = lbmax[d] if lbmax[d] > rbmax[d] else rbmax[d]
                n = self.parent[n]
        self.free.append(leaf)
        self.free.append(parent)
        self.point[leaf] = None
        self.point[parent] = None

    # -- conditional imputation -------------------------------------------

    def impute_leaf(self, p: tuple, missing: frozenset) -> tuple:
        """Conditional traversal for the coordinates in ``missing``:
        follow the tree's cuts on observed dims; on a missing cut dim
        descend into the HEAVIER child (the deterministic analog of the
        RCF library's mass-proportional likely branch —
        ``RandomCutForest.imputeMissingValues`` /
        ``extrapolateBasic``).  Returns the reached leaf's point; the
        caller reads the missing coordinates off it."""
        node = self.root
        if node < 0:
            return ()
        while self.point[node] is None:
            d = self.cutdim[node]
            if d in missing:
                l_, r_ = self.left[node], self.right[node]
                node = l_ if self.mass[l_] >= self.mass[r_] else r_
            else:
                node = (self.left[node] if p[d] <= self.cutval[node]
                        else self.right[node])
        return self.point[node]

    # -- score -------------------------------------------------------------

    def score(self, p: tuple) -> tuple[float, float]:
        """Simulated-insertion anomaly score + the nearest leaf's
        current-slot value (last coordinate) for expected-value
        estimation.

        Separation-probability traversal: at each node the probability
        the random cut of (box ∪ p) separates p is extra/(span+extra);
        separated-at-depth-d contributes 1/(d+1) (unseen score), an
        exact duplicate contributes the mass-damped seen score.  The
        result is normalized by log2(1 + tree mass) so a typical inlier
        scores ≈ 1 — the scale the reference thresholds on.

        :meth:`attribution` re-runs this exact traversal with per-dim
        bookkeeping (kept separate so this hot path stays
        allocation-free) — any change here must be mirrored there;
        the ``sum(attr) == score`` property test enforces it."""
        node = self.root
        if node < 0:
            return 0.0, float("nan")
        depth = 0
        pr = 1.0
        s = 0.0
        while self.point[node] is None:
            bmin, bmax = self.bbmin[node], self.bbmax[node]
            span = 0.0
            extra = 0.0
            for d in range(self.dims):
                span += bmax[d] - bmin[d]
                if p[d] < bmin[d]:
                    extra += bmin[d] - p[d]
                elif p[d] > bmax[d]:
                    extra += p[d] - bmax[d]
            if extra > 0.0:
                psep = extra / (span + extra)
                s += pr * psep / (depth + 1.0)
                pr *= 1.0 - psep
            node = (self.left[node] if p[self.cutdim[node]]
                    <= self.cutval[node] else self.right[node])
            depth += 1
        leaf_pt = self.point[node]
        if leaf_pt == p:
            tm = self.mass[self.root]
            lm = self.mass[node]
            damp = 1.0 - lm / (2.0 * tm)
            s += pr * damp / (depth + math.log2(1.0 + lm))
        else:
            s += pr / (depth + 1.0)
        return s * math.log2(1.0 + self.mass[self.root]), leaf_pt

    def attribution(self, p: tuple) -> tuple[float, list[float]]:
        """Per-dimension attribution of the anomaly score — the
        AnomalyAttributionVisitor decomposition of the same
        separation-probability traversal :meth:`score` runs (the RCF
        library's ``DiVector`` with high+low sides summed per dim).

        At each node the separated-at-this-depth mass
        ``pr·psep/(depth+1)`` is split across dimensions proportional
        to each dimension's share of the required bounding-box
        extension (the probability THAT dimension's cut separates p);
        the final-leaf mass splits proportional to |p − leaf| per dim
        (evenly for an exact duplicate, where no dimension separates).
        Invariant (tested): ``sum(attr) == score`` exactly, per tree
        and therefore per forest average — the library's
        DiVector.getHighLowSum() totalling property.
        """
        node = self.root
        attr = [0.0] * self.dims
        if node < 0:
            return 0.0, attr
        depth = 0
        pr = 1.0
        s = 0.0
        while self.point[node] is None:
            bmin, bmax = self.bbmin[node], self.bbmax[node]
            span = 0.0
            extra = 0.0
            ext = [0.0] * self.dims
            for d in range(self.dims):
                span += bmax[d] - bmin[d]
                if p[d] < bmin[d]:
                    ext[d] = bmin[d] - p[d]
                    extra += ext[d]
                elif p[d] > bmax[d]:
                    ext[d] = p[d] - bmax[d]
                    extra += ext[d]
            if extra > 0.0:
                psep = extra / (span + extra)
                contrib = pr * psep / (depth + 1.0)
                s += contrib
                for d in range(self.dims):
                    if ext[d] > 0.0:
                        attr[d] += contrib * (ext[d] / extra)
                pr *= 1.0 - psep
            node = (self.left[node] if p[self.cutdim[node]]
                    <= self.cutval[node] else self.right[node])
            depth += 1
        leaf_pt = self.point[node]
        if leaf_pt == p:
            tm = self.mass[self.root]
            lm = self.mass[node]
            damp = 1.0 - lm / (2.0 * tm)
            contrib = pr * damp / (depth + math.log2(1.0 + lm))
            s += contrib
            ev = contrib / self.dims
            for d in range(self.dims):
                attr[d] += ev
        else:
            contrib = pr / (depth + 1.0)
            s += contrib
            diffs = [abs(p[d] - leaf_pt[d]) for d in range(self.dims)]
            tot = sum(diffs)
            if tot > 0.0:
                for d in range(self.dims):
                    attr[d] += contrib * (diffs[d] / tot)
            else:
                ev = contrib / self.dims
                for d in range(self.dims):
                    attr[d] += ev
        norm = math.log2(1.0 + self.mass[self.root])
        return s * norm, [a * norm for a in attr]


class StreamingRCF:
    """Forest of :class:`RandomCutTree` with per-tree time-decayed
    reservoir sampling (the reference's CompactSampler posture:
    ``timeDecay = 1/recency_emphasis``, default recency emphasis
    10·sample_size per ``TimeSeriesSettings.DEFAULT_RECENCY_EMPHASIS``).

    ``score_and_update(p)`` scores the point against the current model
    THEN offers it to every tree's sampler — the reference likewise
    scores before ingesting (``getThresholdingResult`` semantics).
    """

    def __init__(self, dims: int, n_trees: int = 50,
                 sample_size: int = 256, time_decay: float | None = None,
                 seed: int = 11):
        self.dims = dims
        self.n_trees = n_trees
        self.sample_size = sample_size
        self.time_decay = (time_decay if time_decay is not None
                           else 1.0 / (10.0 * sample_size))
        master = random.Random(seed)
        self.trees = [RandomCutTree(dims, random.Random(master.getrandbits(64)))
                      for _ in range(n_trees)]
        self.rngs = [random.Random(master.getrandbits(64))
                     for _ in range(n_trees)]
        # per-tree max-heaps of (-logkey, counter, leaf_id): the top is
        # the WORST (largest-key) retained sample — A-ExpJ weighted
        # reservoir with weight exp(decay·seq) in log domain
        self.heaps: list[list] = [[] for _ in range(n_trees)]
        self.seq = 0
        self._ctr = 0

    def score(self, p: tuple,
              expected_dims: int = 1) -> tuple[float, list[float]]:
        """(normalized anomaly score, per-dim median of the nearest
        leaves' LAST ``expected_dims`` coordinates — the expected
        current-slot value(s))."""
        tot = 0.0
        n = 0
        leaves: list[tuple] = []
        for t in self.trees:
            if t.root < 0:
                continue
            s, lp = t.score(p)
            tot += s
            leaves.append(lp)
            n += 1
        if n == 0:
            return 0.0, [float("nan")] * expected_dims
        meds = []
        for d in range(-expected_dims, 0):
            vals = sorted(lp[d] for lp in leaves)
            m = len(vals)
            meds.append(vals[m // 2] if m % 2 else
                        0.5 * (vals[m // 2 - 1] + vals[m // 2]))
        return tot / n, meds

    def attribution(self, p: tuple) -> list[float]:
        """Forest-averaged per-dim attribution (same averaging as
        :meth:`score`, so ``sum(attribution(p)) == score(p)[0]``)."""
        acc = [0.0] * self.dims
        n = 0
        for t in self.trees:
            if t.root < 0:
                continue
            _, a = t.attribution(p)
            for d in range(self.dims):
                acc[d] += a[d]
            n += 1
        if n == 0:
            return acc
        return [a / n for a in acc]

    def impute(self, p: tuple, missing: frozenset) -> list[float]:
        """Median across trees of the conditional-leaf values for the
        ``missing`` coordinates (the library's median aggregation for
        single-block imputation)."""
        cols: list[list[float]] = [[] for _ in missing]
        midx = sorted(missing)
        for t in self.trees:
            if t.root < 0:
                continue
            lp = t.impute_leaf(p, missing)
            for j, d in enumerate(midx):
                cols[j].append(lp[d])
        out = []
        for vals in cols:
            if not vals:
                out.append(float("nan"))
                continue
            vals.sort()
            m = len(vals)
            out.append(vals[m // 2] if m % 2 else
                       0.5 * (vals[m // 2 - 1] + vals[m // 2]))
        return out

    def update(self, p: tuple) -> None:
        """Offer ``p`` to every tree's time-decayed reservoir."""
        lam = self.time_decay
        seq = self.seq
        self.seq += 1
        for i, tree in enumerate(self.trees):
            rng = self.rngs[i]
            heap = self.heaps[i]
            # log of the exponential race key: ln(-ln U) − λ·seq;
            # smaller is better.  Heap is a max-heap via negation.
            u = rng.random()
            while u <= 0.0:
                u = rng.random()
            logkey = math.log(-math.log(u)) - lam * seq
            if len(heap) < self.sample_size:
                leaf = tree.insert(p)
                self._ctr += 1
                heapq.heappush(heap, (-logkey, self._ctr, leaf))
            elif -logkey > heap[0][0]:
                # better than the current worst: evict it
                _, _, old_leaf = heapq.heappop(heap)
                tree.delete(old_leaf)
                leaf = tree.insert(p)
                self._ctr += 1
                heapq.heappush(heap, (-logkey, self._ctr, leaf))

    def score_and_update(self, p: tuple,
                         expected_dims: int = 1) -> tuple[float, list[float]]:
        s, e = self.score(p, expected_dims=expected_dims)
        self.update(p)
        return s, e


class RCFStream:
    """Streaming wrapper: shingling + forest + the thresholder that
    turns raw scores into z-like values.

    ``update(v) -> (z, expected)`` — NaN during warm-up (shingle not
    full, or fewer than ``min_samples`` scores observed, matching
    ``TimeSeriesSettings.NUM_MIN_SAMPLES``).  The thresholder is the
    BasicThresholder shape: discounted deviation of the raw score
    sequence, z = (score − mean)/std computed against the state BEFORE
    the current score is absorbed.  Picklable — the historical runner
    checkpoints it between pieces.

    ``n_features > 1`` is the reference's ACTUAL model shape: one
    forest over the JOINTLY shingled feature vector (point dims =
    shingle × n_features, each input dim normalized independently) —
    ``update`` then takes a length-``n_features`` vector and returns
    ``(z, expected_vector)``.
    """

    def __init__(self, shingle: int = 8, n_trees: int = 50,
                 sample_size: int = 256, time_decay: float | None = None,
                 min_samples: int = 32, seed: int = 11,
                 thr_discount: float = 1.0 / 256.0, eps: float = 1e-9,
                 normalize: bool = True,
                 norm_discount: float = 1.0 / 1024.0,
                 clip: float = 10.0,
                 alert_once: bool = True, alert_threshold: float = 3.0,
                 realert_factor: float = 1.2,
                 n_features: int = 1,
                 attribution: bool = True):
        self.shingle = shingle
        # attribution=False skips the second forest traversal on
        # anomalous points for consumers that never read
        # last_attribution (e.g. the univariate melt scorer)
        self.attribution = attribution
        self.n_features = n_features
        self.min_samples = min_samples
        self.eps = eps
        self.thr_discount = thr_discount
        # alertOnce(true) analog (ADColdStart.java:207): inside one
        # anomaly run (consecutive points above alert_threshold), only
        # the first point — or a point substantially MORE anomalous
        # than the run's max (×realert_factor) — alerts; the rest
        # report 0 (the reference reports grade 0 for continuations of
        # an already-alerted anomaly)
        self.alert_once = alert_once
        self.alert_threshold = alert_threshold
        self.realert_factor = realert_factor
        self.run_max = 0.0
        self.in_run = False
        self.forest = StreamingRCF(shingle * n_features, n_trees=n_trees,
                                   sample_size=sample_size,
                                   time_decay=time_decay, seed=seed)
        self.buf: list[float] = []
        self.n_scored = 0
        self.s_mean = 0.0
        self.s_var = 0.0
        # TransformMethod.NORMALIZE analog (ADColdStart.java:206): each
        # input dim is standardized against discounted streaming
        # mean/std BEFORE shingling, clipped like the library's
        # preprocessor — a level spike then stands out against an O(1)
        # bounding box instead of the raw data range
        self.normalize = normalize
        self.norm_discount = norm_discount
        self.clip = clip
        self.n_in = 0
        self.in_mean = [0.0] * n_features
        self.in_var = [0.0] * n_features
        # per-feature attribution of the LAST update's anomaly (None
        # when the point wasn't anomalous — the reference's raw
        # attribution is null when grade ≤ 0, ModelUtil.java:133-136)
        self.last_attribution: list[float] | None = None
        # where in the shingle the anomaly mass sits: 0 = the current
        # input, negative = that many intervals in the past (the
        # library's relativeIndex; PredictorCorrector reads the
        # attribution block at (shingleSize-1+relativeIndex)·baseDims).
        # past_values = the RAW inputs at that slot (reported only when
        # relative_index < 0, like ThresholdingResult.pastValues)
        self.last_relative_index: int | None = None
        self.last_past_values: list[float] | None = None
        self.raw_buf: list[list[float]] = []   # last `shingle` raw inputs

    def _transform(self, vs: list[float]) -> list[float]:
        """Standardize against the CURRENT stats (no absorption — the
        model scores, and its expected value is denormalized, against
        the state before the point is ingested; ``_absorb`` runs
        after)."""
        if not self.normalize:
            return list(vs)
        out = []
        for d, v in enumerate(vs):
            if self.n_in < 2:
                xn = 0.0
            else:
                xn = (v - self.in_mean[d]) \
                    / (math.sqrt(self.in_var[d]) + self.eps)
                if xn > self.clip:
                    xn = self.clip
                elif xn < -self.clip:
                    xn = -self.clip
            out.append(xn)
        return out

    def _absorb(self, vs: list[float]) -> None:
        if not self.normalize:
            return
        if self.n_in == 0:
            self.in_mean = [float(v) for v in vs]
            self.in_var = [0.0] * len(vs)
        else:
            a = max(self.norm_discount, 1.0 / (self.n_in + 1.0))
            for d, v in enumerate(vs):
                dd = v - self.in_mean[d]
                self.in_mean[d] += a * dd
                self.in_var[d] = (1.0 - a) * (self.in_var[d] + a * dd * dd)
        self.n_in += 1

    def _inverse(self, xns: list[float]) -> list[float]:
        if not self.normalize:
            return list(xns)
        return [self.in_mean[d] + xn * (math.sqrt(self.in_var[d])
                                        + self.eps)
                for d, xn in enumerate(xns)]

    def update(self, v):
        """Scalar in/out for ``n_features=1``; vector in/out otherwise."""
        F = self.n_features
        vs = [float(v)] if F == 1 else [float(x) for x in v]
        if len(vs) != F:
            raise ValueError(f"expected {F} features, got {len(vs)}")
        xs = self._transform(vs)
        self.buf.extend(xs)
        if len(self.buf) > self.shingle * F:
            del self.buf[:F]
        self.raw_buf.append(vs)
        if len(self.raw_buf) > self.shingle:
            del self.raw_buf[0]
        self.last_attribution = None
        self.last_relative_index = None
        self.last_past_values = None
        if len(self.buf) < self.shingle * F:
            self._absorb(vs)
            nan = float("nan")
            return (nan, nan) if F == 1 else (nan, [nan] * F)
        p = tuple(self.buf)
        s, exp = self.forest.score(p, expected_dims=F)
        # denormalize the expected value with the PRE-absorb stats —
        # the forest scored the pre-absorb point, and folding the
        # current (possibly anomalous) value into the stats first
        # would bias "expected" toward the anomaly, shrinking the
        # actual-vs-expected margins suppression rules compare
        exp = self._inverse(exp)
        self._absorb(vs)
        z = float("nan")
        if self.n_scored >= self.min_samples:
            z = (s - self.s_mean) / (math.sqrt(self.s_var) + self.eps)
            if self.alert_once:
                az = abs(z)
                if az > self.alert_threshold:
                    if self.in_run and az <= self.run_max * self.realert_factor:
                        z = 0.0          # suppressed continuation
                    self.run_max = max(self.run_max, az)
                    self.in_run = True
                else:
                    self.in_run = False
                    self.run_max = 0.0
        if self.attribution and z == z and abs(z) > self.alert_threshold:
            # anomalous (and not a suppressed continuation): attribute
            # the score against the PRE-ingest forest (the reference
            # scores and attributes before the model absorbs the
            # point).  The shingle block holding the most attribution
            # mass locates the anomaly in time (PredictorCorrector's
            # relativeIndex: block − (shingleSize−1), ≤ 0); the
            # reported per-feature shares are THAT block's, normalized
            # to sum 1 (ModelUtil.normalizeAttribution), and when the
            # anomaly is in the past the raw inputs at that slot are
            # surfaced as pastValues (ThresholdingResult.pastValues)
            raw = self.forest.attribution(p)
            sums = [sum(raw[s * F:(s + 1) * F])
                    for s in range(self.shingle)]
            s_max = max(range(self.shingle), key=sums.__getitem__)
            block = raw[s_max * F:(s_max + 1) * F]
            ssum = sums[s_max]
            if ssum > 0.0:
                self.last_attribution = [b / ssum for b in block]
                rel = s_max - (self.shingle - 1)
                self.last_relative_index = rel
                if rel < 0 and len(self.raw_buf) == self.shingle:
                    self.last_past_values = list(self.raw_buf[s_max])
        self.forest.update(p)
        # absorb the score into the discounted deviation AFTER z
        if self.n_scored == 0:
            self.s_mean = s
            self.s_var = 0.0
        else:
            a = max(self.thr_discount, 1.0 / (self.n_scored + 1.0))
            d = s - self.s_mean
            self.s_mean += a * d
            self.s_var = (1.0 - a) * (self.s_var + a * d * d)
        self.n_scored += 1
        return (z, exp[0]) if self.n_features == 1 else (z, exp)

    def extrapolate(self, horizon: int) -> list[list[float]] | None:
        """RCFCaster-style extrapolation (``RandomCutForest.
        extrapolateBasic`` shape): iterated one-step conditional
        imputation — shift the shingle by one interval, impute the now
        missing newest slot from the forest (conditional traversal,
        median across trees), feed the imputed slot back in, repeat
        ``horizon`` times.  Runs in NORMALIZED space and denormalizes
        with the current streaming stats.  Returns ``horizon`` rows of
        ``n_features`` values, or ``None`` while warm (shingle not
        full / fewer than ``min_samples`` scored points) — the
        reference likewise refuses to forecast before initialization.
        Read-only: neither the forest nor the stream state changes."""
        F = self.n_features
        if len(self.buf) < self.shingle * F or self.n_scored < self.min_samples:
            return None
        work = list(self.buf)
        missing = frozenset(range((self.shingle - 1) * F, self.shingle * F))
        out = []
        for _ in range(horizon):
            p = tuple(work[F:]) + (0.0,) * F
            imputed = self.forest.impute(p, missing)
            out.append(self._inverse(imputed))
            work = work[F:] + list(imputed)
        return out

    def to_bytes(self) -> bytes:
        return pickle.dumps(self, protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def from_bytes(b: bytes) -> "RCFStream":
        obj = pickle.loads(b)
        if not isinstance(obj, RCFStream):
            raise ValueError("not an RCFStream checkpoint")
        if not hasattr(obj, "n_features"):
            # checkpoint from before the multivariate extension:
            # scalar normalization state → one-feature vectors
            obj.n_features = 1
            obj.in_mean = [obj.in_mean]
            obj.in_var = [obj.in_var]
        if not hasattr(obj, "attribution"):
            obj.attribution = True
        if not hasattr(obj, "last_attribution"):
            obj.last_attribution = None
        if not hasattr(obj, "last_relative_index"):
            obj.last_relative_index = None
            obj.last_past_values = None
            obj.raw_buf = []
        return obj


def rcf_stream_factory(**kwargs):
    """Factory for :func:`~anomaly_detection_spark.detector.
    run_historical`'s ``scorer_factory`` seam: calling it yields a
    fresh :class:`RCFStream`; ``restore(bytes)`` revives a checkpoint
    (the reference's per-entity RCF checkpoint round-trip,
    ``CheckpointDao.java``)."""

    def make() -> RCFStream:
        return RCFStream(**kwargs)

    make.restore = RCFStream.from_bytes
    # surfaced so the detector paths can check threshold wiring and
    # route multivariate factories (run_once_stateful_joint)
    make.alert_threshold = kwargs.get("alert_threshold", 3.0)
    make.n_features = kwargs.get("n_features", 1)
    make.multivariate = make.n_features > 1
    return make


def rcf_scorer(shingle: int = 8, n_trees: int = 50,
               sample_size: int = 256, time_decay: float | None = None,
               min_samples: int = 32, seed: int = 11,
               thr_discount: float = 1.0 / 256.0,
               normalize: bool = True,
               norm_discount: float = 1.0 / 1024.0,
               alert_once: bool = True, alert_threshold: float = 3.0,
               realert_factor: float = 1.2):
    """Per-entity scorer for the :func:`~anomaly_detection_spark.
    features.scoring.score_entities` seam: values → (z, expected).

    Defaults mirror the reference model config
    (``TimeSeriesSettings.java:195-205``: 50 trees × 256 samples,
    shingle 8, recency emphasis 10·256, min 32 samples).  Reduced
    configs (e.g. ``n_trees=20, sample_size=128``) trade a noisier
    score distribution for ~3× less compute — the quality floors in
    ``tests/test_rcf_floors.py`` pass at the reduced setting.
    """

    def score(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        n = len(values)
        z = np.full(n, np.nan)
        exp = np.full(n, np.nan)
        stream = RCFStream(shingle=shingle, n_trees=n_trees,
                           sample_size=sample_size, time_decay=time_decay,
                           min_samples=min_samples, seed=seed,
                           thr_discount=thr_discount, normalize=normalize,
                           norm_discount=norm_discount,
                           alert_once=alert_once,
                           alert_threshold=alert_threshold,
                           realert_factor=realert_factor,
                           attribution=False)  # never read on this path
        for i in range(n):
            z[i], exp[i] = stream.update(float(values[i]))
        return z, exp

    score.returns_expected = True
    score.alert_threshold = alert_threshold
    return score


def rcf_scorer_joint(n_features: int, shingle: int = 8, n_trees: int = 50,
                     sample_size: int = 256,
                     time_decay: float | None = None,
                     min_samples: int = 32, seed: int = 11,
                     thr_discount: float = 1.0 / 256.0,
                     normalize: bool = True,
                     norm_discount: float = 1.0 / 1024.0,
                     alert_once: bool = True, alert_threshold: float = 3.0,
                     realert_factor: float = 1.2):
    """JOINT multivariate scorer for the detector's per-entity seam —
    the reference's actual model shape: ONE forest per entity over the
    jointly shingled feature vector (shingle × n_features dims), one
    anomaly score per interval, per-feature expected values from the
    nearest-leaf medians.

    Takes an (n, n_features) value matrix (feature columns in sorted
    feature-name order, the detector's convention) and returns
    ``(z[n], expected[n, n_features])``.  Marked ``multivariate`` so
    :func:`~anomaly_detection_spark.detector.preview` routes it
    through the per-entity wide path instead of the per-feature melt.
    """

    def score(values: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray, np.ndarray,
                                            np.ndarray]:
        V = np.asarray(values, dtype=np.float64)
        if V.ndim == 1:
            V = V[:, None]
        n = len(V)
        z = np.full(n, np.nan)
        exp = np.full((n, n_features), np.nan)
        attr = np.full((n, n_features), np.nan)
        rel = np.full(n, np.nan)
        past = np.full((n, n_features), np.nan)
        stream = RCFStream(shingle=shingle, n_trees=n_trees,
                           sample_size=sample_size, time_decay=time_decay,
                           min_samples=min_samples, seed=seed,
                           thr_discount=thr_discount, normalize=normalize,
                           norm_discount=norm_discount,
                           alert_once=alert_once,
                           alert_threshold=alert_threshold,
                           realert_factor=realert_factor,
                           n_features=n_features)
        for i in range(n):
            zi, ei = stream.update(V[i])
            z[i] = zi
            exp[i] = ei if n_features > 1 else [ei]
            if stream.last_attribution is not None:
                attr[i] = stream.last_attribution
                rel[i] = stream.last_relative_index
                if stream.last_past_values is not None:
                    past[i] = stream.last_past_values
        return z, exp, attr, rel, past

    score.multivariate = True
    score.returns_expected = True
    score.returns_attribution = True
    score.alert_threshold = alert_threshold
    return score


def ingest_v1_checkpoint(raw: str | bytes | dict,
                         seed: int = 11) -> tuple[StreamingRCF, list]:
    """Ingest an AD-1.x RCF model checkpoint (the reference's
    ``CheckpointDao`` v1 JSON: ``{"sp": [[...point]...], "rcf":
    "<serialized RandomCutForest>"}``, e.g.
    ``src/test/resources/org/opensearch/ad/ml/rcf_1_0_checkpoint.json``)
    into a live :class:`StreamingRCF`.

    Faithful to the reference's own BWC path: v1 checkpoints store
    each tree's sampler contents (``weightedSamples`` =
    {point, weight, sequenceIndex}), and migration reconstructs trees
    by REINSERTING the samples — tree topology is rebuilt, the sample
    SET (the model state that matters) is preserved exactly.  The
    stored ``weight`` is the sampler's log race key
    (ln(−ln U) − λ·seq), which is exactly this class's heap key, so
    future evictions behave identically; fresh RNG streams replace the
    serialized ones (documented divergence — affects future random
    draws only, like any re-seeded migration).

    Returns ``(forest, sample_points)`` — ``sp`` is the v1 recent-
    points queue, returned for the caller to replay/extend warm-up.
    """
    import json as _json

    obj = (raw if isinstance(raw, dict)
           else _json.loads(raw if isinstance(raw, str)
                            else raw.decode()))
    sp = [tuple(map(float, p)) for p in obj.get("sp") or []]
    rcf = obj["rcf"]
    if isinstance(rcf, str):
        rcf = _json.loads(rcf)
    dims = int(rcf["dimensions"])
    updaters = rcf["executor"]["executor"]["treeUpdaters"]
    forest = StreamingRCF(
        dims=dims, n_trees=int(rcf["numberOfTrees"]),
        sample_size=int(rcf["sampleSize"]),
        time_decay=float(rcf.get("lambda", 1e-4)), seed=seed)
    max_seq = 0
    for i, upd in enumerate(updaters):
        tree = forest.trees[i]
        heap = forest.heaps[i]
        for ws in upd["sampler"]["weightedSamples"]:
            p = tuple(float(x) for x in ws["point"])
            if len(p) != dims:
                raise ValueError(
                    f"sample dimension {len(p)} != model dims {dims}")
            leaf = tree.insert(p)
            forest._ctr += 1
            heapq.heappush(heap,
                           (-float(ws["weight"]), forest._ctr, leaf))
            max_seq = max(max_seq, int(ws.get("sequenceIndex", 0)))
    forest.seq = max_seq + 1
    return forest, sp
