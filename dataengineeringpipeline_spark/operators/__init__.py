"""Large-scale training-data pipeline operators.

Beyond the reference's ETL surface, a 100 TB training-data pipeline needs
corpus-level operators; each submodule is Spark-first (built-in functions
and shuffle-conscious join shapes, Pandas UDFs only where built-ins can't
express the semantics):

- :mod:`text` — language-ID, quality scoring, token counting, document
  fingerprinting
- :mod:`dedup` — exact, n-gram Jaccard, MinHash+LSH, SimHash near-dup
- :mod:`similarity` — embedding ANN search (brute-force + LSH-bucketed)
- :mod:`multimodal` — opaque binary columns with typed metadata, Pandas-UDF
  decode/feature plumbing
"""
