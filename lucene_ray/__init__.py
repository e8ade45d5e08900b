"""lucene_ray — a Ray-Data-native inverted-index build + BM25 top-k engine.

A from-scratch rebuild of the *capabilities* of Apache Lucene's inverted-index
and BM25 search subset (reference: /root/reference, Lucene 9.10-dev) on top of
ray.data Datasets, zero-copy Arrow batches, and actor pools — NOT a port of
Lucene's execution engine.

Architecture (see SURVEY.md §7):
  - tokenize  = stateless ``map_batches`` over pyarrow batches (RE2 kernels)
  - postings  = per-segment vectorized group-by-term (numpy) inside the build
                task; global term stats via a partial-aggregate ``groupby``
  - merge     = TieredMergePolicy math over a JSON manifest + actor-pool
                merge workers
  - query     = stateful scorer actor pool (segments loaded once per actor),
                block-max pruned DAAT with an exhaustive TAAT oracle for duels
  - lineage   = per-segment manifest entries → checkpoint/resume
"""

__version__ = "0.1.0"
