from .aggs_body import interval_ms, run_aggs  # noqa: F401
from .brute_force import (  # noqa: F401
    analyze_docs,
    bm25_scores,
    bm25_topk_bruteforce,
    corpus_stats,
    match_phrase_prefix_topk,
    match_phrase_topk,
    multi_match_topk,
    sloppy_phrase_freq,
)
from .budget import QueryTimeoutError, time_budget  # noqa: F401
from .index_search import IndexReader, bm25_topk_indexed, fetch_docs  # noqa: F401
from .query_string import compile_query_string  # noqa: F401
