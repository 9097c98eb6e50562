from .bucketed import read_transcripts, write_bucketed_transcripts

__all__ = ["write_bucketed_transcripts", "read_transcripts"]
