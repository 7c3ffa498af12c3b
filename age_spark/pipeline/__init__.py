"""LLM-training-data pipeline operators (beyond the reference's surface).

These are first-class engine capabilities for 100 TB data curation:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal column plumbing. Everything is built from native Spark SQL
functions (JVM-side, codegen-friendly); Python appears only in the clearly
marked Pandas-UDF multimodal kernels.
"""

from . import dedup, similarity, text, multimodal  # noqa: F401
