"""ES `query_string` / `simple_query_string` analog: parse Lucene query
syntax into the engine's bool-query clause frame and score it.

The reference exposes synced content through Elasticsearch, where
`query_string` is the human-facing search-box entry point (Lucene
classic QueryParser semantics are public). Supported subset:

- bare terms            -> `should` clauses (default_operator=OR)
- `+term`               -> `must` clause
- `-term`               -> `must_not` clause
- `term^2.5`            -> per-clause boost (score multiplier)
- `"quoted phrase"`     -> positional phrase clause, FILTER context
  (`+"p"` must contain, `-"p"` must not); phrases gate matching but do
  not add score — a documented simplification vs Lucene PhraseQuery
  scoring (phrase-frequency BM25), kept identical on the DuckDB oracle.

Unsupported syntax, handled leniently (ES lenient-mode style):
`field:term` scoped tokens are DROPPED (no field mapping here);
`~` fuzziness markers are ignored (the term still matches exactly);
parentheses act as whitespace; AND/OR/NOT connectives are not keywords
(they normalize to ordinary lowercase terms). Terms are normalized with
the same analyzer convention as the index (lowercase alnum runs).

Scale shape: parsing is driver-side over the tiny query set; scoring
reuses the distinct-term-weight pipeline (weights computed once per
(term, doc), broadcast clause expansion, ONE (query, doc) agg shuffle);
phrase gating joins ONLY the phrase terms' postings positions.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connectors_spark import BM25_B, BM25_K1
from connectors_spark.operators.build import IndexFrames
from connectors_spark.operators.query import _distinct_term_weights

_TOKEN_RE = re.compile(
    r'(?P<prefix>[+-])?'
    r'(?:"(?P<phrase>[^"]*)"|(?P<term>[^\s"^]+))'
    r'(?:\^(?P<boost>\d+(?:\.\d+)?))?'
)
_TERM_RE = re.compile(r"[a-z0-9]+")

_ROLE = {"+": "must", "-": "must_not", None: "should", "": "should"}


def parse_query_string(q: str) -> dict:
    """-> {"clauses": [(role, term, boost)], "phrases": [(role, [terms])]}.

    Roles follow the Lucene classic parser: '+' requires, '-' prohibits,
    bare means optional-scoring. Multi-token bare "terms" that normalize
    to several alnum runs (e.g. `don't`) contribute each run."""
    clauses: list[tuple[str, str, float]] = []
    phrases: list[tuple[str, list[str]]] = []
    for m in _TOKEN_RE.finditer(q):
        role = _ROLE[m.group("prefix")]
        boost = float(m.group("boost") or 1.0)
        if m.group("phrase") is not None:
            terms = _TERM_RE.findall(m.group("phrase").lower())
            if len(terms) == 1:  # one-word "phrase" is just a term
                clauses.append((role, terms[0], boost))
            elif terms:
                # phrase role: must/must_not gate; bare phrases gate too
                # (filter context — see module docstring)
                phrases.append(("must_not" if role == "must_not"
                                else "must", terms))
        else:
            raw = m.group("term")
            if ":" in raw:  # field-scoped token: dropped (lenient)
                continue
            for t in _TERM_RE.findall(raw.lower()):
                clauses.append((role, t, boost))
    return {"clauses": clauses, "phrases": phrases}


def _phrase_doc_ids(index: IndexFrames, terms: list[str]) -> DataFrame:
    """doc_ids containing `terms` consecutively — incremental position
    join over ONLY the phrase terms' postings (positions were stored at
    build time; the join frame is |phrase| narrow posting slices)."""
    pos = index.postings.select(
        "term", "doc_id", F.explode("positions").alias("pos")
    )
    cur = pos.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for i, t in enumerate(terms[1:], start=1):
        ti = pos.filter(F.col("term") == t).select(
            F.col("doc_id").alias("_d"), F.col("pos").alias(f"p{i}")
        )
        cur = cur.join(
            ti, (cur.doc_id == ti._d) & (ti[f"p{i}"] == F.col("p0") + i)
        ).drop("_d")
    return cur.select("doc_id").distinct()


def score_query_string(
    index: IndexFrames,
    queries: list[dict],
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_scores: int | None = None,
    broadcast_docs_max: int = 2_000_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score) for parsed query strings.

    `queries`: [{"query_id", "query_string", "k"}]. Scoring clauses
    (must + should) contribute boost * BM25 weight; must terms are all
    required, any must_not term excludes, phrases gate in filter
    context. Docs enter the candidate set only through a scoring-clause
    term hit (matches the oracle contract; see module docstring)."""
    spark: SparkSession = index.postings.sparkSession
    rows, phrase_jobs = [], []
    for q in queries:
        parsed = parse_query_string(q["query_string"])
        for role, term, boost in parsed["clauses"]:
            rows.append((q["query_id"], int(q["k"]), role, term, boost))
        for role, terms in parsed["phrases"]:
            phrase_jobs.append((q["query_id"], role, terms))
    clauses = spark.createDataFrame(
        rows, "query_id string, k int, role string, term string, boost double"
    )

    dterms = clauses.select("term").distinct()
    tw = _distinct_term_weights(index, dterms, k1, b, broadcast_docs_max)
    contrib = tw.join(F.broadcast(clauses), "term")
    scoring = F.col("role").isin("must", "should")
    scored = contrib.groupBy("query_id", "k", "doc_id").agg(
        F.sum(F.when(scoring, F.col("w") * F.col("boost"))
              .otherwise(F.lit(0.0))).alias("score"),
        F.count_distinct(
            F.when(F.col("role") == "must", F.col("term"))).alias("_n_must"),
        F.count_distinct(
            F.when(F.col("role") == "must_not", F.col("term"))).alias("_n_not"),
    )
    req = clauses.groupBy("query_id").agg(
        F.count_distinct(
            F.when(F.col("role") == "must", F.col("term"))).alias("_req_must"),
    )
    out = scored.join(F.broadcast(req), "query_id").filter(
        (F.col("_n_must") == F.col("_req_must")) & (F.col("_n_not") == 0)
    )
    # phrase gates: tiny distinct-doc_id frames, broadcast semi/anti join
    for qid, role, terms in phrase_jobs:
        ph = F.broadcast(_phrase_doc_ids(index, terms))
        in_q = F.col("query_id") == qid
        matched = out.filter(in_q)
        matched = (matched.join(ph, "doc_id", "left_semi") if role == "must"
                   else matched.join(ph, "doc_id", "left_anti"))
        out = out.filter(~in_q).unionByName(matched)
    if round_scores is not None:
        out = out.withColumn("score", F.round(F.col("score"), round_scores))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )


_TPL_VAR_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def render_search_template(template: str, params: dict) -> str:
    """ES search template analog (mustache-substituted stored queries):
    replace every {{var}} with its parameter value. Strict on missing
    parameters (raises KeyError naming the variable — ES errors the
    same way), lenient on extra params. Values are substituted as text
    into the query_string syntax, matching ES's template-then-parse
    order."""
    def sub(m):
        name = m.group(1)
        if name not in params:
            raise KeyError(f"search template parameter missing: {name!r}")
        return str(params[name])

    return _TPL_VAR_RE.sub(sub, template)
