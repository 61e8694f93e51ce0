"""BM25 keyword retrieval — the LEXICAL search tier beside the embedding
ANN family.

Training-data pipelines need keyword top-k as much as vector top-k:
eval-set decontamination probes ("which corpus docs score high against
this benchmark question"), targeted data selection, and
retrieval-augmented dedup all run on a term index, and BM25 (Robertson &
Zaragoza 2009; the Lucene `k1`/`b` variant with the non-negative
``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf) is the standard scorer.

Index-once / query-many split (the `dedup_index` discipline): a 100 TB
corpus is indexed in ONE pass into two relations a caller persists and
reuses across query batches —

- ``postings (doc_id, dl, tf, term)``: explode → hash-agg with map-side
  combine; the ONE corpus-sized shuffle in the build, keyed on
  (doc, term);
- ``doc_freq (term, df)``: a second, vocabulary-sized agg over the
  distinct doc-term pairs (far smaller than the corpus);

plus two scalars (``n_docs``, ``avgdl``) from a single bounded agg.
Querying never reshuffles the corpus: the query relation is TINY by
construction, so (query-term × doc_freq) resolves to ≤ |query terms|
idf rows that BROADCAST onto the postings scan; the only data-sized
exchange is the (query_id, doc_id) score agg over matched postings, and
the final top-k runs through `operators.windowed.topn_per_key`
(salted=True) so a query matching half the corpus sorts in P local
top-k's + one ≤ k×P pass, not one giant partition.

Determinism contract (the `quality_score` float discipline):
- every input to the score is exact (integer tf/df/dl/N; ``avgdl`` is
  the IEEE quotient of exact integers, computed identically here and in
  a SQL oracle as double(sum_dl)/double(n_docs));
- the per-term contribution is a double whose only cross-engine freedom
  is the last ulp of ``ln``;
- per-(query, doc) summation routes each contribution through
  DECIMAL(38,18) — order-free addition, so a 1000-executor partial-agg
  tree and a single-threaded oracle agree bit-for-bit;
- the emitted score rounds to 6 decimals (~1e-15 ulp slack against a
  1e-6 grid — the geo_daily_return contract class), and ranking orders
  by (rounded score DESC, doc_id ASC) so exact ties break
  deterministically in any engine.

Pinned semantics: terms are `textstats.match_tokens` normalization
(lowercase, edge punctuation stripped) with empties dropped; ``dl`` and
``avgdl`` count normalized terms (empty docs count in N and in avgdl's
denominator); query terms are a SET (no query-side tf weighting).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.windowed import topn_per_key
from .textstats import match_tokens, tokenize


def _terms(text: Column) -> Column:
    return F.filter(match_tokens(tokenize(text)), lambda t: t != "")


@dataclass(frozen=True)
class BM25Index:
    """The persistable index relations + corpus scalars."""

    postings: DataFrame  # (doc_id, dl, term, tf)
    doc_freq: DataFrame  # (term, df)
    n_docs: int
    avgdl: float


def bm25_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> BM25Index:
    """One corpus pass → the two index relations + (n_docs, avgdl)."""
    with_dl = docs.select(
        F.col(id_col).alias("doc_id"),
        _terms(F.col(text_col)).alias("_terms"),
    ).select(
        "doc_id", "_terms", F.size("_terms").cast("long").alias("dl")
    )
    postings = (
        with_dl.select("doc_id", "dl", F.explode("_terms").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    doc_freq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs, sum_dl = with_dl.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).first()
    avgdl = (
        float(sum_dl) / float(n_docs) if n_docs and sum_dl else 0.0
    )
    return BM25Index(postings, doc_freq, int(n_docs), avgdl)


def bm25_topk(
    index: BM25Index,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` corpus docs per query: ``(query_id, doc_id, score,
    n_terms_matched, rank)`` — score rounded to 6 decimals, rank 1-based
    by (score DESC, doc_id ASC)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if index.n_docs == 0 or index.avgdl == 0.0:
        # no postings exist either way; short-circuit the div-by-zero
        avgdl = 1.0
    else:
        avgdl = index.avgdl

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(_terms(F.col(text_col)))).alias(
            "term"
        ),
    )
    # ≤ |distinct query terms| rows survive: broadcast the tiny side into
    # the vocabulary-sized doc_freq scan, then broadcast the RESULT onto
    # the corpus-sized postings — the corpus is never reshuffled here
    idf = F.log(
        F.lit(1.0)
        + (
            (F.lit(float(index.n_docs)) - F.col("df").cast("double"))
            + F.lit(0.5)
        )
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    qidf = (
        index.doc_freq.join(F.broadcast(qterms), "term")
        .select("query_id", "term", idf.alias("idf"))
    )
    contrib = F.col("idf") * (
        (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl))
            )
        )
    )
    scored = (
        index.postings.join(F.broadcast(qidf), "term")
        .select("query_id", "doc_id", contrib.alias("_c"))
        .groupBy("query_id", "doc_id")
        .agg(
            # DECIMAL(38,18) routing: order-free summation (see module
            # docstring) — the double sum would be partial-agg-order
            # dependent
            F.sum(F.col("_c").cast("decimal(38,18)")).alias("_s"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("_s").cast("double"), 6).alias("score"),
            "n_terms_matched",
        )
    )
    top = topn_per_key(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        k,
        salted=True,
    )
    # rank over the ≤ k×|queries| survivors only — bounded window
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


def tfidf_keywords(index: BM25Index, top_n: int = 5) -> DataFrame:
    """Per-document keyword extraction off the SAME standing index:
    top-``top_n`` terms per doc by ``tf · idf`` (the bm25 idf, so one
    index serves retrieval AND tagging) — ``(doc_id, term, tf, df,
    score, rank)``, score rounded to 6 decimals, rank 1-based by
    (score DESC, term ASC).

    Shape: one term-keyed shuffle join (postings × doc_freq — the
    vocabulary side is too large to assume broadcastable at corpus
    scale; AQE broadcasts it when it is), then the per-doc window —
    doc-keyed, naturally balanced (a doc holds at most its own distinct
    terms), so no salting is needed. The score is a single multiply of
    an exact integer by one ln — no float summation, no DECIMAL routing.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    idf = F.log(
        F.lit(1.0)
        + (
            (F.lit(float(index.n_docs)) - F.col("df").cast("double"))
            + F.lit(0.5)
        )
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    scored = index.postings.join(index.doc_freq, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf").cast("double") * idf, 6).alias("score"),
    )
    top = topn_per_key(
        scored,
        ["doc_id"],
        [F.col("score").desc(), F.col("term").asc()],
        top_n,
        salted=False,
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long"))
