"""LLM-training-data pipeline operators (beyond the reference's surface).

These are first-class engine capabilities for 100 TB data curation:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search (brute-force + LSH-bucketed + IVF ANN), exact
string-similarity join (prefix-filtered trigram Jaccard), text analysis
(language-ID, quality scoring, repetition signals, token counting,
fingerprinting, PII redaction), and multimodal column plumbing with real
pure-Python decoders (PPM/BMP/PNG/JPEG incl. progressive). Everything is
built from native Spark SQL functions (JVM-side, codegen-friendly);
Python appears only in the clearly marked Pandas-UDF multimodal kernels.
"""

from . import dedup, fuzzyjoin, multimodal, similarity, text  # noqa: F401
