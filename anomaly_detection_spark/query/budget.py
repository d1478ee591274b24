"""S7: driver-side query time budget.

The reference bounds every paged retrieval with a timeout and
client-side expiry — the page loop checks the clock and abandons the
whole request cleanly (``CompositeRetriever.java:371-400``,
``AggregationPrep.java:276-281``).  The Spark analog: run the query's
actions inside a job group, arm a timer that cancels the group at the
deadline, and surface the cancellation as :class:`QueryTimeoutError`.
Cancellation interrupts running tasks (``interruptOnCancel``), so a
runaway stage — an unbounded WAND over a stopword query at corpus
scale — stops consuming executors instead of finishing in the
background.
"""

from __future__ import annotations

import threading
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession


class QueryTimeoutError(RuntimeError):
    """A query exceeded its time budget and was abandoned."""


@contextmanager
def time_budget(spark: SparkSession, seconds: float, desc: str = "query"):
    """Run Spark actions under a deadline; raise QueryTimeoutError past it.

    Everything executed inside the block runs in a dedicated job group;
    at the deadline the group is cancelled (tasks interrupted) and the
    resulting job failure is re-raised as :class:`QueryTimeoutError`.
    """
    sc = spark.sparkContext
    group = f"adspark-budget-{uuid.uuid4().hex[:12]}"
    expired = threading.Event()

    def _cancel() -> None:
        expired.set()
        try:
            sc.cancelJobGroup(group)
        except Exception:  # pragma: no cover - sc already stopped
            pass

    sc.setJobGroup(group, f"{desc} (budget {seconds}s)",
                   interruptOnCancel=True)
    timer = threading.Timer(seconds, _cancel)
    timer.daemon = True
    timer.start()
    try:
        yield
        if expired.is_set():
            # the deadline passed between the last action and here
            raise QueryTimeoutError(
                f"{desc} exceeded its {seconds}s budget")
    except QueryTimeoutError:
        raise
    except Exception as exc:
        if expired.is_set():
            raise QueryTimeoutError(
                f"{desc} exceeded its {seconds}s budget") from exc
        raise
    finally:
        timer.cancel()
        try:
            sc._jsc.clearJobGroup()
        except Exception:  # pragma: no cover - older py4j surface
            sc.setJobGroup("", "")
