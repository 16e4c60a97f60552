"""Large-scale training-data pipeline operators (the north-star
extensions beyond the reference's own surface, BASELINE.json):
dedup, text analysis, similarity search, multimodal columns."""
