"""Inverted-index storage layer: codec, SPIMI segment build, manifests, WAND.

Layout (doc-sharded, like ES shards / the reference's 0.1° stripes —
`striper/FileNameKeyGenerator.java:24-28`): every document's postings live
entirely in shard = pmod(xxhash64(docid), n_shards), so top-k queries run
shard-local scoring (block-max pruning) and merge tiny per-shard top-k's.
Term-level global stats (df for idf) are aggregated across shards with an
explicitly salted two-level reduce (hot-term skew).
"""
