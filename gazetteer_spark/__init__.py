"""gazetteer_spark — a PySpark-native full-text (BM25) index build + query engine.

Brand-new engine with the query/data-processing capabilities of the
reference (kiselev-dv/gazetteer, a batch OSM→Elasticsearch indexer),
re-expressed Spark-first per SURVEY.md:

- analyzer chain (ref: addresses/AddressesUtils.java:24-31 foldASCII,
  AddressesSchemesParserImpl.java:25-154 scheme explode) →
  :mod:`gazetteer_spark.analyzer` — JVM-native expression chain + an
  Arrow-vectorized pandas-UDF variant with identical semantics.
- stripe partitioning + per-stripe join tasks (ref:
  striper/FileNameKeyGenerator.java:24-28, join/JoinSliceRunable.java) →
  doc-sharded SPIMI segment build in :mod:`gazetteer_spark.index.spimi`.
- sorted binary side indexes + external page sort/merge (ref:
  utils/index/MMapBBIndex.java:290-405) → sortWithinPartitions +
  in-partition posting-list assembly.
- bit-packed ID codec w/ dictionary tails (ref: diff/indx/ByteUtils.java:155-218)
  → delta+varbyte posting codec in :mod:`gazetteer_spark.index.codec`.
- distance-sort + id tie-break rank pinning (ref:
  join/JoinSliceRunable.java:848-875) → (score desc, docid asc) top-k.
- diff/resume (ref: diff/Diff.java:132-235, sortupdate/SortAndUpdateTask.java)
  → per-shard segment manifests + anti-join resume in
  :mod:`gazetteer_spark.index.spimi` (manifest commit lives there).
"""

__version__ = "0.2.0"

K1 = 1.2
B = 0.75
