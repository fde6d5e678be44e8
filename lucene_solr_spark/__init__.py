"""lucene_solr_spark — a PySpark-native inverted-index + BM25 analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference (``technologycoder/lucene-solr``, an apache/lucene-solr 8.x-era
fork), re-expressed Spark-first: DataFrames + parquet/Iceberg-style
immutable segment tables + vectorized Arrow/pandas UDF kernels.

Subpackages
-----------
analysis    tokenize → lowercase → stop → Porter analyzer chain
            (reference: lucene/analysis/common, L/analysis/standard/)
util        SmallFloat norm quantization, varint (Lucene vInt) codec
index       docID assignment, posting-list build, segment merge,
            block compression, checkpoint manifest
            (reference: L/index/DefaultIndexingChain, SegmentMerger,
            L/codecs/lucene84/)
search      query tree, BM25 scoring, brute-force + block-max WAND top-k
            (reference: L/search/: TermQuery, BooleanQuery, WANDScorer,
            BM25Similarity, TopScoreDocCollector)
relational  facet / grouping / streaming-expression analogs
            (reference: S/search/facet/, SJ/io/stream/)
textops     training-data pipeline ops: dedup (exact/minhash/simhash),
            ANN similarity, language-ID, quality scoring, fingerprints
streaming   incremental index maintenance via Structured Streaming
            (reference analog: S/update soft-commit + TopicStream)
"""

__version__ = "0.1.0"
