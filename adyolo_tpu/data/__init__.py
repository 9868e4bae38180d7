"""Host-side data pipeline: IO, chunking, label encoding, batching."""
