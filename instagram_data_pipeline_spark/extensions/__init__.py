"""Extension operators for large-scale training-data pipelines
(SURVEY §2.12): deduplication, similarity search, multimodal plumbing.
"""
