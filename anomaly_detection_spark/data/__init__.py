from .transcripts import assign_docids, generate_transcripts  # noqa: F401
