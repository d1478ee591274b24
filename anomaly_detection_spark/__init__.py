"""anomaly_detection_spark — a from-scratch PySpark-native inverted-index
build + BM25 query engine with the query/data-processing capabilities of
the OpenSearch anomaly-detection plugin's engine layer.

Layout (see SURVEY.md for the reference mapping):

- ``data``      — deterministic synthetic ``transcripts`` table generator
                  (conv_id, turn_idx, role, text, tool, ts) and stable docid
                  assignment.
- ``functions`` — vectorized primitives: tokenizer (pandas UDF), posting
                  codecs (delta-gap + varint in numpy), BM25 math.
- ``index``     — segment build, merge/compaction, manifest + checkpoints.
- ``query``     — brute-force and index-backed (block-max WAND) top-k BM25,
                  the detector-style query-DSL planner, aggregations.
- ``features``  — feature pipeline parity: date_histogram / date_range
                  feature vectors, shingles, linear imputation.
- ``pipeline``  — training-data ops: dedup (exact/MinHash-LSH/SimHash/
                  n-gram Jaccard/embedding-cosine), similarity search,
                  text analysis, multimodal plumbing.
- ``streaming`` — Structured Streaming equivalents of the plugin's
                  interval-job cadence (window_delay = watermark).
- ``detector``  — the user-facing detector config + preview / run_once
                  surface (source pattern → filter → features → per-
                  entity scoring → anomaly-result rows).

Everything is DataFrame-first; Python appears only in Arrow-batched
pandas UDFs (tokenize / codec / WAND scoring) — never per-row.
"""

__version__ = "0.2.0"
