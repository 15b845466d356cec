"""Large-scale training-data pipeline operators (post-parity extensions):
text analysis, deduplication (exact / n-gram Jaccard / MinHash-LSH /
SimHash / embedding), similarity search, multimodal column plumbing."""

from . import dedup, multimodal, similarity, text  # noqa: F401
