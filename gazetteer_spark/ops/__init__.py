"""Training-data pipeline operators over the engine's analyzer primitives.

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search over embeddings, text analysis (language-ID, quality, token counts,
fingerprints), and multimodal binary-column plumbing.

Everything is expressed as declarative DataFrame plans over JVM built-ins
(the candidate-generation → exact-verify shape throughout mirrors the
reference's envelope-query-then-exact-predicate joins,
`join/JoinSliceRunable.many2ManyJoin:1071-1087`).
"""

HASH_PRIME = 2147483647  # 2^31 - 1: a*h stays under 2^63 (ANSI-safe)
