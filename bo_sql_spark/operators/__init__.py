"""Beyond-reference operators for large-scale training-data pipelines.

dedup       -- exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup
similarity  -- brute-force cosine top-k + LSH-bucketed ANN
text        -- language-ID, quality scoring, token counting, fingerprinting
multimodal  -- binary payload columns + typed metadata (decode stubbed)
asof        -- as-of / range joins

Every operator is a function DataFrame -> DataFrame built from
declarative Spark primitives; the only Python-side execution is the
Arrow-batched as-of merge and the (stubbed) media decoding.
"""
