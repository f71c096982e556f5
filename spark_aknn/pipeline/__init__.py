"""Large-scale training-data pipeline operators (graft additions):
deduplication, similarity search, text analysis, multimodal plumbing."""
