"""Large-scale training-data pipeline operators (post-parity extensions):
text analysis, deduplication (exact / n-gram Jaccard / MinHash-LSH /
SimHash / embedding), similarity search, k-means clustering, BM25 /
TF-IDF retrieval + n-gram decontamination, context-window chunking +
greedy sequence packing, PII scrubbing, multimodal column plumbing,
deterministic sampling / train-val-test splits / temperature mixture
sampling."""

from . import (dedup, joins, multimodal, packing, privacy,  # noqa: F401
               profiling, reshape, retrieval, sampling, similarity,
               sketches, text, timeseries)
