"""Engine constants, mirroring the reference's performance envelope.

Each constant cites the reference file fixing it (SURVEY.md §6):
  - BLOCK_SIZE 128:      lucene/core/.../codecs/lucene99/Lucene99PostingsFormat.java:360
  - PFOR_MAX_EXCEPTIONS: codecs/lucene99/PForUtil.java:29 (<= 7 patched exceptions)
  - BM25 defaults:       search/similarities/BM25Similarity.java:99-101
  - merge policy:        index/TieredMergePolicy.java:89-98
  - MAX_TOKEN_LEN 255:   analysis/standard/StandardAnalyzer.java:37
  - TOTAL_HITS_THRESHOLD search/IndexSearcher.java:99
"""

# postings block size (docs per packed block; also the skip/impact granularity)
BLOCK_SIZE = 128

# PFor: max number of patched exceptions per block
PFOR_MAX_EXCEPTIONS = 7

# BM25 defaults
BM25_K1 = 1.2
BM25_B = 0.75
DISCOUNT_OVERLAPS = True

# analysis
MAX_TOKEN_LEN = 255

# keyword (StringField-style, non-tokenized) fields indexed alongside the
# analyzed content field. Their postings live in the same term dictionary
# under a "<field>:<value>" composite key (':' can never appear in an
# analyzed token, so the namespaces are disjoint) — the per-field terms-dict
# analog (index/FieldInfos.java / document/StringField.java).
KEYWORD_FIELDS = ("repo", "path", "commit", "lang")

# DEFAULT numeric doc-values schema (always present; derived at build).
# Stored twice, mirroring the reference's split: doc-ordered
# docvalues.parquet (sort / fetch — index/DocValues.java NUMERIC) and
# value-sorted points.parquet (range filters — the BKD tree's sorted-leaves
# role, codecs/lucene90/Lucene90PointsFormat.java; 1-D only, binary search
# replaces the tree levels). The PER-INDEX schema extends this via
# build_index(dv_fields=<source columns>, sorted_dv_fields=...,
# sorted_set_dv_fields=...); the query-PARSER's field:[a TO b] numeric
# routing keys off this static default only — programmatic PointRangeQuery
# works for any field in the index's schema.
NUMERIC_DV_FIELDS = ("n_chars",)

# TieredMergePolicy defaults (bytes)
# per-NODE cap for concurrent allocation-heavy tasks (segment builds,
# merges): this VM's memory subsystem saturates near 10 such workers
# (BASELINE.md protocol; r3 re-measure: identical 200K-doc build 9.1s at
# 10-way vs 17.5s at 24-way). A node-local constant — multi-node clusters
# run one such pool per node. Override: LUCENE_RAY_HEAVY_WORKERS env.
import os as _os

PER_NODE_HEAVY_WORKERS = int(_os.environ.get("LUCENE_RAY_HEAVY_WORKERS", "10"))

MERGE_FLOOR_SEGMENT_BYTES = 2 * 1024 * 1024  # 2 MB
MERGE_MAX_MERGED_SEGMENT_BYTES = 5 * 1024 * 1024 * 1024  # 5 GB
MERGE_SEGS_PER_TIER = 10.0
MERGE_MAX_MERGE_AT_ONCE = 10
MERGE_DELETES_PCT_ALLOWED = 20.0

# search
TOTAL_HITS_THRESHOLD = 1000
DEFAULT_TOP_K = 10

# index build: target docs per segment when splitting large inputs.
# At 100 TB this bounds per-task memory (tokenized postings for one segment
# must fit a worker heap) and keeps query slices uniform — the analog of
# IndexSearcher's 250K-doc slice cap (IndexSearcher.java:105).
TARGET_DOCS_PER_SEGMENT = 250_000

# ... and the BYTE bound beside the doc bound: a segment spec also closes
# once its row groups exceed this much COMPRESSED input (Parquet footer
# total_byte_size), so giant documents cannot blow a task's heap — the
# IndexWriter 16 MB-RAM-buffer flush trigger (IndexWriterConfig.java:83),
# scaled for a columnar batch build (tokenized state is ~5-10x the
# compressed input; 64 MiB in -> a few-GB-bounded task at worst).
SEGMENT_TARGET_INPUT_BYTES = 64 << 20
