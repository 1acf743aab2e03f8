"""lucene_solr_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch re-creation of the capabilities of the Lucene 8.x / Solr 8.x
shared tree (reference: /root/reference, the post-split apache/lucene-solr
stub whose README designates the branch_8x code line), built Ray-Data-first:

- ingest     : ``ray.data.read_parquet`` over Common-Crawl-style pages
               (url, warc_ts, html, text, lang)
- analysis   : UAX#29-style tokenizer + lowercase filter in a stateful
               actor pool (``map_batches`` over zero-copy Arrow)
- index      : per-partition immutable segments — sorted term blocks,
               delta + FOR bit-packed 128-doc posting blocks with
               per-block impacts, SmallFloat lossy norms, docmap
- stats      : global (N, avgdl, df) via partial-aggregated groupby
- search     : BM25 (k1=1.2, b=0.75) top-k, exhaustive vectorized and
               block-max WAND, per-partition heaps merged rank-identically
- extras     : dedup (exact / MinHash-LSH / SimHash), ANN over embeddings,
               text quality / language-ID stages for training-data curation

Nothing here is a port: all structures are Arrow/numpy-native and every
distributed step is a ``ray.data.Dataset`` transform.
"""

__version__ = "0.1.0"
