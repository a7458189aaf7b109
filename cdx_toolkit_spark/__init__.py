"""cdx_toolkit_spark — a from-scratch PySpark-native analytics + crawl-frontier
engine with the query surface of cocrawler/cdx_toolkit.

Built Spark-first: DataFrame/SQL plans optimized by Catalyst, vectorized
pandas/Arrow UDFs on the hot paths, zero per-row Python. The reference
(/root/reference, Apache-2.0) defines WHAT is computed — capture-record query
semantics, timestamp algebra, filter dialects — not HOW; nothing here is a
translation of its serial HTTP client.

Layout:
  timeutils   — CDX 14-digit timestamp algebra (reference timeutils.py parity)
  compat      — pywb/IA filter + field dialect normalization
  surt        — SURT URL canonicalization (vectorized)
  textkit     — text extraction / digest / token + quality analysis kernels
  cdx_view    — deterministic CDX capture view derivation (portable SQL)
  query       — CdxQuery: the DataFrame query builder (iter/get/closest/...)
  pages       — synthetic pages-table generator for tests
  dedup       — exact / MinHash-LSH / SimHash / n-gram-Jaccard / cosine dedup
  similarity  — embedding cosine top-k (brute force + LSH-bucketed)
  multimodal  — binary media columns: schema + mapInPandas plumbing
  warc        — WARC gzip-member ingest, byte-range record fetch, segmented sink
  ingest      — pywb JSONL / IA list-of-lists wire decoders (+ encoders)
  render      — kv/csv/jsonl renders + wayback replay reconstruction kernels
  cli         — the `cdxt iter|warc|size` command-line shim
  frontier/   — URL-seen bloom + cuckoo shards, politeness + error-class
                retry/backoff, priority drain (two-phase epoch commit with
                pipelined bookkeeping), streaming drain + rate metrics
"""

__version__ = "0.1.0"
