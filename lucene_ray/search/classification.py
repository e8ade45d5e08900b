"""Index-backed Naive Bayes text classification
(classification/SimpleNaiveBayesClassifier.java): classify an unseen text
against the classes of a keyword field using only index statistics —
log P(c|d) ∝ logPrior(c) + Σ_w log P(w|c) with add-one smoothing:

  prior      = ln(df_c) - ln(docsWithClass)           (:279-281)
  P(w|c)     = (hits(w, c) + 1) / (avgUniqueTermsPerDoc * df_c
                                   + docsWithClass)   (:209-231, :241-252)
  avgUnique  = sumDocFreq(content) / docCount(content)

Float protocol: every ln is scalar math.log and the per-token log sum is
LEFT-ASSOCIATIVE in the text's token order — the SQL oracle mirrors the
exact chain, so scores are bit-identical (repo float-oracle rules).
Complements the kNN classifier (ops/knn.py knn_classify).
"""

from __future__ import annotations

import math

from lucene_ray.search.query import BooleanQuery, TermQuery

__all__ = ["SimpleNaiveBayesClassifier"]


class SimpleNaiveBayesClassifier:
    def __init__(self, searcher, class_field: str = "lang"):
        self.searcher = searcher
        self.class_field = class_field
        reader = searcher.reader
        # content collection stats, column-pruned (term, df) reads
        import os

        import pyarrow.parquet as pq

        sum_doc_freq = 0
        for entry in reader.segments:
            sr = reader.segment_reader(entry.name)
            t = pq.read_table(
                os.path.join(sr.seg_dir, "postings.parquet"),
                columns=["term", "df"],
                memory_map=True,
            )
            import pyarrow.compute as pc

            mask = pc.invert(pc.match_substring(t.column("term"), ":"))
            sum_doc_freq += int(
                pc.sum(t.filter(mask).column("df")).as_py() or 0
            )
            # docCount(content): docs with at least one content token
        doc_count_content = 0
        for entry in reader.segments:
            sr = reader.segment_reader(entry.name)
            doc_count_content += int((sr.doc_len > 0).sum())
        self.sum_doc_freq = sum_doc_freq
        self.doc_count_content = doc_count_content
        # classes from the keyword term dictionary ('field:value' side)
        prefix = f"{class_field}:"
        vocab = reader.vocabulary(include_fields=True)
        self.classes = sorted(
            str(t)[len(prefix):] for t in vocab.tolist() if str(t).startswith(prefix)
        )
        # docsWithClass (countDocsWithClass:167): docs holding ANY class value
        self.docs_with_class = sum(
            self._count([TermQuery(f"{prefix}{c}")]) for c in self.classes
        )

    def _count(self, must: list) -> int:
        return self.searcher.count(BooleanQuery(must=must))

    def assign_classes(self, text: str) -> list[tuple[str, float]]:
        """All classes scored, (score desc, class asc) — the reference's
        assignClasses ranking (normalization omitted: it is monotonic)."""
        tokens = self.searcher.analyzer.tokenize_text(text)
        avg_unique = self.sum_doc_freq / self.doc_count_content
        out = []
        for c in self.classes:
            cls_term = TermQuery(f"{self.class_field}:{c}")
            df_c = self._count([cls_term])
            if df_c == 0:
                continue
            prior = math.log(df_c) - math.log(self.docs_with_class)
            den = avg_unique * df_c + self.docs_with_class
            loglik = 0.0
            for w in tokens:
                hits = self._count([TermQuery(w), cls_term])
                loglik += math.log((hits + 1) / den)
            out.append((c, prior + loglik))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out

    def assign_class(self, text: str) -> str | None:
        res = self.assign_classes(text)
        return res[0][0] if res else None


class CachingNaiveBayesClassifier(SimpleNaiveBayesClassifier):
    """CachingNaiveBayesClassifier (classification/
    CachingNaiveBayesClassifier.java): identical results to SimpleNaiveBayes
    with the per-(word, class) hit counts memoized across calls (the
    reference's reInitCache word->class map). Scores are bit-identical to
    the parent — only the count lookups are cached."""

    def __init__(self, searcher, class_field: str = "lang"):
        self._cache: dict[tuple, int] = {}  # before super(): __init__ counts
        super().__init__(searcher, class_field)

    def _count(self, must: list) -> int:
        key = tuple(sorted(q.term for q in must))
        if key not in self._cache:
            self._cache[key] = super()._count(must)
        return self._cache[key]


def dataset_split(
    searcher,
    class_field: str = "lang",
    test_ratio: float = 0.2,
    cv_ratio: float = 0.1,
) -> tuple:
    """DatasetSplitter.split (classification/utils/DatasetSplitter.java:80-165)
    as a closed form: the reference walks classes grouped by
    Sort.INDEXORDER (groups ordered by first docid, docs within a group in
    docid order) with a GLOBAL doc counter b, assigning doc -> test when
    (b even AND tc < n_class*test_ratio), else -> cv when
    (cvc < n_class*cv_ratio), else train. Because b increments on EVERY
    doc regardless of assignment, the loop is equivalent to two rank
    predicates: an even-b doc is test iff its 0-based rank among the
    class's even-b docs < n*test_ratio, and a non-test doc is cv iff its
    0-based rank among the class's non-test docs < n*cv_ratio (induction:
    every earlier candidate under the cap was admitted). The closed form
    is pure window arithmetic — it distributes as map_batches over
    (class, docid) ranks at scale, unlike the sequential loop.

    Returns (docids, splits) — int64 global docids ascending and a
    parallel object array of 'train' | 'test' | 'cv'."""
    import numpy as np

    from lucene_ray.search.engine import fetch_stored
    from lucene_ray.search.query import BooleanQuery, MatchAllDocsQuery

    td = searcher.search(BooleanQuery(must=[MatchAllDocsQuery()]), 1 << 62)
    docids = np.sort(td.docids)
    if len(docids) == 0:
        return docids, np.array([], dtype=object)
    stored = fetch_stored(searcher.reader, docids)
    cls = np.asarray(stored.column(class_field).to_pylist(), dtype=object)
    splits = np.empty(len(docids), dtype=object)
    # group order = first docid per class; docids is ascending, so the
    # class of each first occurrence orders the groups (reference
    # GroupingSearch groupSort=INDEXORDER) — and b is the global rank in
    # (group, docid) order
    _, first_idx = np.unique(cls, return_index=True)
    group_order = {cls[i]: i for i in np.sort(first_idx)}
    order = np.lexsort((docids, np.array([group_order[c] for c in cls])))
    b = np.empty(len(docids), dtype=np.int64)
    b[order] = np.arange(len(docids))
    for c in group_order:
        sel = np.nonzero(cls == c)[0]  # docid-asc within the class
        n = len(sel)
        even = b[sel] % 2 == 0
        tc_before = np.cumsum(even) - even  # 0-based even rank
        is_test = even & (tc_before < n * test_ratio)
        non_test = ~is_test
        cvc_before = np.cumsum(non_test) - non_test
        is_cv = non_test & (cvc_before < n * cv_ratio)
        s = np.where(is_test, "test", np.where(is_cv, "cv", "train"))
        splits[sel] = s
    return docids, splits


def confusion_matrix(
    train_searcher,
    test_items,
    class_field: str = "lang",
) -> list[tuple[str, str, int]]:
    """ConfusionMatrixGenerator.getConfusionMatrix (classification/utils/
    ConfusionMatrixGenerator.java): classify each (actual, text) test item
    with SimpleNaiveBayes trained on ``train_searcher`` and count
    (actual, predicted) pairs. Returns sorted (actual, predicted, n).

    Scoring is the SimpleNaiveBayesClassifier chain verbatim (prior +
    left-assoc per-token ln sums, math.log floats — bit-identical to the
    SQL oracle); the per-token class hit counts come from ONE term search
    per distinct token (matched docs' stored class gather), cached across
    test items — the CachingNaiveBayes strategy, same counts as the
    per-class conjunction counts."""
    from collections import Counter

    from lucene_ray.search.engine import fetch_stored

    clf = SimpleNaiveBayesClassifier(train_searcher, class_field)
    avg_unique = clf.sum_doc_freq / clf.doc_count_content
    dwc = clf.docs_with_class
    params = []
    for c in clf.classes:
        df_c = clf._count([TermQuery(f"{class_field}:{c}")])
        if df_c == 0:
            continue
        params.append(
            (c, math.log(df_c) - math.log(dwc), avg_unique * df_c + dwc)
        )
    cache: dict[str, Counter] = {}

    def class_hits(w: str) -> Counter:
        if w not in cache:
            td = train_searcher.search(BooleanQuery(must=[TermQuery(w)]), 1 << 62)
            if len(td.docids) == 0:
                cache[w] = Counter()
            else:
                stored = fetch_stored(train_searcher.reader, td.docids)
                cache[w] = Counter(stored.column(class_field).to_pylist())
        return cache[w]

    matrix: Counter = Counter()
    for actual, text in test_items:
        tokens = train_searcher.analyzer.tokenize_text(text)
        best = None
        for c, prior, den in params:
            loglik = 0.0
            for w in tokens:
                loglik += math.log((class_hits(w)[c] + 1) / den)
            score = prior + loglik
            if best is None or score > best[0] or (
                score == best[0] and c < best[1]
            ):
                best = (score, c)
        if best is not None:
            matrix[(actual, best[1])] += 1
    return sorted((a, p, n) for (a, p), n in matrix.items())


def doc_to_sparse_vector(reader, docid: int) -> list[tuple[str, float]]:
    """DocToDoubleVectorUtils.toSparseLocalizedDoubleVector
    (classification/utils/DocToDoubleVectorUtils.java): the doc's term
    vector as (term, freq) doubles in term order — requires
    build_index(term_vectors=True)."""
    import numpy as np

    tv = reader.term_vectors(np.array([docid], dtype=np.int64))
    rows = sorted(
        zip(tv.column("term").to_pylist(), tv.column("freq").to_pylist())
    )
    return [(t, float(f)) for t, f in rows]


def doc_to_dense_vector(reader, docid: int, vocabulary) -> "np.ndarray":
    """DocToDoubleVectorUtils.toDenseVector: freqs over a shared
    ``vocabulary`` (the reference walks the field's full terms enum; any
    sorted vocabulary slice works the same way), absent terms 0.0."""
    import numpy as np

    out = np.zeros(len(vocabulary), dtype=np.float64)
    idx = {t: i for i, t in enumerate(vocabulary)}
    for t, f in doc_to_sparse_vector(reader, docid):
        i = idx.get(t)
        if i is not None:
            out[i] = f
    return out
