"""Large-scale training-data-pipeline operators (BASELINE.json north
star): deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + IVF), text analysis
(language-ID, quality, token counts, fingerprints) and multimodal
binary-column plumbing.

Every operator has two postures documented in its docstring: the
correctness path (oracle-checkable at test SF) and the 100 TB path
(what changes at cluster scale — usually candidate pruning, banding or
bucketing to kill the quadratic term).
"""
