"""Large-scale training-data pipeline operators (post-parity extensions):
text analysis, deduplication (exact / n-gram Jaccard / MinHash-LSH /
SimHash / embedding), similarity search, multimodal column plumbing,
deterministic sampling / train-val-test splits."""

from . import (dedup, multimodal, sampling, similarity,  # noqa: F401
               text, timeseries)
