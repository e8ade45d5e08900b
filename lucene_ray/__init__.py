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


def _tune_allocator() -> None:
    """Keep freed pages inside the process instead of returning them to the
    host (opt out: LUCENE_RAY_NO_ALLOC_TUNING=1).

    Root cause (BASELINE.md round-3 "host-state" section, measured): on this
    class of virtualized host, the FIRST streaming read of freshly-mapped
    pages is intermittently ~100x slower than warm pages (1.4 s vs 0.011 s
    for one 32 MB cumsum), while re-reads are always full speed. glibc's
    default M_MMAP_THRESHOLD (128 KB) sends every large numpy/Arrow buffer
    through mmap/munmap, so each build task re-pays the fresh-page tax on
    tens of buffers. Raising the threshold (+ trim threshold) makes the
    arena retain and RECYCLE those pages: only the first task per worker
    pays, and the per-allocation penalty disappears (measured in the
    degraded state: repeated segment builds 19-65 s untuned vs 0.5-5 s
    tuned after warmup). Arrow's default jemalloc pool is switched to the
    system (malloc) pool so parquet decode buffers recycle the same arena.

    This is once-per-process state: Ray workers pick it up when they import
    lucene_ray (inside map_batches functions), the driver/bench when they
    import the library. Cost: worker RSS holds at its high-water mark —
    bounded by one task's peak, acceptable against per-node memory.
    """
    import os

    if os.environ.get("LUCENE_RAY_NO_ALLOC_TUNING") == "1":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 256 * 1024 * 1024)
        libc.mallopt(M_TRIM_THRESHOLD, 1024 * 1024 * 1024)
    except Exception:
        pass
    try:
        import pyarrow as pa

        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass


_tune_allocator()
