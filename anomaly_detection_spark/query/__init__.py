from .brute_force import analyze_docs, bm25_topk_bruteforce, corpus_stats  # noqa: F401
