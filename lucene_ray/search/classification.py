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
