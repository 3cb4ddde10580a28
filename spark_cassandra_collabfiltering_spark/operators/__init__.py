"""SURVEY §2 operator inventory as named, tested DataFrame→DataFrame
functions, plus the large-scale extension operators (dedup, similarity,
text, multimodal)."""
