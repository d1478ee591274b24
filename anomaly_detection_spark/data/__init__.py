from .transcripts import assign_docids, generate_transcripts, topic_words  # noqa: F401
