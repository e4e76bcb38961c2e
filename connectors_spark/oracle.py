"""Single-process NumPy reference engine — the rank-identity oracle.

Mirrors the reference's ftest pattern of pinning expected state before
running the engine (reference: app/connectors_service/tests/ftest.sh:414-418),
but as a golden-output scorer: tokenizer and BM25 formulas are imported
from the engine modules (functions/analysis.py, operators/score.py), so
oracle/engine parity is by construction.

Deterministic accumulation: per (query, doc), term contributions are
summed in sorted-term order in float64; ranks break ties
(score DESC, doc_id ASC).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from connectors_spark import BM25_B, BM25_K1
from connectors_spark.functions.analysis import tokenize_py
from connectors_spark.operators.score import idf_np, tf_norm_np


class OracleIndex:
    def __init__(self, docs: list[tuple[str, str]],
                 stop_words: list[str] | None = None,
                 stemmer: str = "none"):
        """docs: [(doc_id, text)]"""
        self.postings: dict[str, dict[str, int]] = defaultdict(dict)
        self.positions: dict[str, dict[str, list[int]]] = defaultdict(dict)
        self.dl: dict[str, int] = {}
        self.stop_words = stop_words
        self.stemmer = stemmer
        for doc_id, text in docs:
            toks = tokenize_py(text, stop_words, stemmer)
            self.dl[doc_id] = len(toks)
            for pos, term in enumerate(toks):
                self.positions[term].setdefault(doc_id, []).append(pos)
            for term, tf in Counter(toks).items():
                self.postings[term][doc_id] = tf
        self.n_docs = len(self.dl)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def score_query(self, query_text: str, k: int = 10,
                    k1: float = BM25_K1, b: float = BM25_B,
                    mode: str = "or") -> list[tuple[str, float]]:
        """[(doc_id, score)] — top-k, ties (score DESC, doc_id ASC).
        mode='and': docs must match every query term."""
        terms = sorted(set(tokenize_py(query_text, self.stop_words, self.stemmer)))
        acc: dict[str, float] = defaultdict(float)
        matched: dict[str, int] = defaultdict(int)
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = float(idf_np(self.n_docs, self.df(term)))
            for doc_id, tf in plist.items():
                acc[doc_id] += idf * float(
                    tf_norm_np(tf, self.dl[doc_id], self.avgdl, k1, b)
                )
                matched[doc_id] += 1
        if mode == "and":
            acc = {d: s for d, s in acc.items() if matched[d] == len(terms)}
        ranked = sorted(acc.items(), key=lambda it: (-it[1], it[0]))
        return ranked[:k]

    def phrase_query(self, phrase_text: str, k: int = 10,
                     k1: float = BM25_K1, b: float = BM25_B) -> list[tuple[str, float]]:
        """Docs containing the exact token phrase (adjacent positions),
        ranked by the phrase terms' BM25 sum; ties (score DESC, doc ASC)."""
        terms = tokenize_py(phrase_text, self.stop_words, self.stemmer)
        if not terms:
            return []
        cand = set(self.positions.get(terms[0], {}))
        for t in terms[1:]:
            cand &= set(self.positions.get(t, {}))
        matched = []
        for doc in cand:
            starts = set(self.positions[terms[0]][doc])
            for i, t in enumerate(terms[1:], start=1):
                starts &= {p - i for p in self.positions[t][doc]}
                if not starts:
                    break
            if starts:
                matched.append(doc)
        scored = []
        for doc in matched:
            s = 0.0
            for term in sorted(set(terms)):
                idf = float(idf_np(self.n_docs, self.df(term)))
                tf = self.postings[term][doc]
                s += idf * float(tf_norm_np(tf, self.dl[doc], self.avgdl, k1, b))
            scored.append((doc, s))
        scored.sort(key=lambda it: (-it[1], it[0]))
        return scored[:k]

    def score_queryset(self, queries: list[dict]) -> list[tuple]:
        """[(query_id, rank, doc_id, score)] for [{query_id, query_text, k}]."""
        out = []
        for q in queries:
            for rank, (doc_id, score) in enumerate(
                self.score_query(q["query_text"], q.get("k", 10)), start=1
            ):
                out.append((q["query_id"], rank, doc_id, score))
        return out
