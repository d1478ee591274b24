from .dedup import (  # noqa: F401
    dedup_corpus,
    duplicate_clusters,
    embedding_neardup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from .similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    ivf_ann_topk,
    ivf_assign,
    ivf_centroids,
    ivfpq_ann_topk,
    lsh_ann_topk,
    pq_encode,
    pq_train_books,
)
from .chunking import chunk_documents  # noqa: F401
from .text import (  # noqa: F401
    doc_fingerprints,
    language_id,
    perplexity_scores,
    quality_scores,
    sparse_encode,
    train_unigram_lm,
    token_counts,
)
from .curation import (  # noqa: F401
    decontaminate,
    hash_split,
    mix_to_token_budget,
    pack_sequences,
    paragraph_dedup,
    pii_redact,
    repetition_metrics,
    sample_corpus,
    sample_to_token_budget,
)
