"""DSIR-style data selection with hashed n-gram importance weights
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023) — domain-targeted selection FROM a raw pool.

The curation question this tier answers is the one the quality and dedup
tiers don't: "which raw-pool documents LOOK LIKE my target domain?". DSIR
fits two bag-of-hashed-ngram unigram models — one over the target
documents, one over the rest of the pool — and scores every raw document
by its log importance weight ``log p_target(x) − log p_raw(x)``; the
top-weighted raw documents are the domain-matched selection. (The paper
samples with Gumbel noise; the deterministic top-k variant implemented
here is its zero-temperature limit, chosen so the whole pass is
reproducible and oracle-checkable.)

Feature map: word unigrams + bigrams, hashed into ``n_buckets`` buckets —
the paper's hashed n-gram features. The bucket hash is the first 15 hex
chars of md5 taken mod ``n_buckets``, computed identically by Spark
(``conv(substr(md5(g),1,15),16,10) % B``) and DuckDB
(``('0x'||…)::bigint % B``), so the twin re-derives every weight.

Scale posture (100 TB): the per-bucket model is BOUNDED (≤ n_buckets rows
regardless of corpus size) and broadcast; scoring probes it pipelined
inside the scan stage, so the only corpus-sized exchange is the final
doc-keyed aggregate (map-side combined). Selection is
``orderBy(...).limit(k)`` — Spark's distributed TakeOrdered, a per-
partition top-k + driver merge of k·P rows, NOT a global sort. The
per-doc weight sum routes through DECIMAL(38,18) exactly like the char-LM
scorer (quality.py): each double log-ratio casts to decimal injectively,
and the decimal sum is order-free, so a 1000-executor run and the
single-threaded oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_bucket
from .textstats import token_ngrams, tokenize


def hashed_gram_buckets(
    text_col: Column | str, n_buckets: int = 4096
) -> Column:
    """Array of hashed-ngram bucket ids (word unigrams + bigrams), one per
    occurrence — the DSIR feature map as a single column expression (the
    shared md5-prefix family, llmdata/hashing.py)."""
    toks = tokenize(text_col)
    grams = F.concat(toks, token_ngrams(toks, 2))
    return F.transform(grams, lambda g: md5_bucket(g, n_buckets))


def dsir_bucket_model(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """(bucket, logratio) — add-one-smoothed log importance ratio per
    hashed-ngram bucket, fit on the full pool split by ``target``. At most
    ``n_buckets`` rows whatever the corpus size: one corpus scan, one
    bucket-keyed aggregate.

    The logs are taken DRIVER-side over the collected bucket counts (a
    bounded ≤ n_buckets-row collect, same budget class as the k-means
    centroid collect in similarity.py) rather than with Spark's ``F.log``:
    the JVM's ln (StrictMath/intrinsic) disagrees with libm in the last
    ulp on ~0.2% of inputs, which a bit-exact oracle comparison catches
    immediately — Python's ``math.log`` and DuckDB's ``ln`` both resolve
    to the platform libm and agree bit-for-bit. The corpus-sized work
    (tokenize, hash, count) all stays distributed."""
    import math

    occ = docs.select(
        target.alias("__t"),
        F.explode(hashed_gram_buckets(text_col, n_buckets)).alias("bucket"),
    )
    counts = occ.groupBy("bucket").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("__t"), 0).otherwise(1)).alias("cr"),
    )
    rows = counts.collect()  # bounded: ≤ n_buckets rows
    t_tot = sum(r["ct"] for r in rows)
    r_tot = sum(r["cr"] for r in rows)
    b = float(n_buckets)
    model = [
        (
            r["bucket"],
            math.log((r["ct"] + 1.0) / (t_tot + b))
            - math.log((r["cr"] + 1.0) / (r_tot + b)),
        )
        for r in rows
    ]
    return docs.sparkSession.createDataFrame(
        model, schema="bucket bigint, logratio double"
    )


def dsir_scores(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    model: DataFrame | None = None,
) -> DataFrame:
    """(id, is_target, n_feats, logw) for every pool document: ``logw`` is
    the decimal-routed sum of per-occurrence bucket log-ratios (NULL for
    docs with no features — too short to score; callers decide their
    fate). Pass a pre-fit ``model`` to score a fresh batch against a
    standing one; unseen buckets contribute 0 (no evidence)."""
    if model is None:
        model = dsir_bucket_model(docs, target, text_col, n_buckets)
    occ = docs.select(
        F.col(id_col),
        F.explode(hashed_gram_buckets(text_col, n_buckets)).alias("bucket"),
    )
    scored = (
        occ.join(F.broadcast(model), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(
                F.coalesce(F.col("logratio"), F.lit(0.0)).cast(
                    "decimal(38,18)"
                )
            )
            .cast("double")
            .alias("logw"),
        )
    )
    base = docs.select(F.col(id_col), target.alias("is_target"))
    return base.join(scored, id_col, "left").select(
        id_col,
        "is_target",
        F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
        "logw",
    )


def dsir_select(
    docs: DataFrame,
    target: Column,
    top_k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """The selection: top ``top_k`` NON-target documents by importance
    weight (descending, id ascending on ties), ranked 1..k. TakeOrdered
    does the global top-k without a global sort; the rank window runs over
    the k surviving rows only (the adjudicated post-limit-small-window
    pattern).

    The ordering key and output weight are ``logw`` rounded to 6 decimals
    (the quality tier's ``ce6`` convention): the exact decimal sum leaves
    a ≤1-ulp-per-occurrence residue between Spark's shortest-repr
    double→decimal cast and the oracle's, and the 6-decimal round absorbs
    it; genuinely tied documents (e.g. exact duplicate texts, which sum to
    the identical decimal in any engine) fall through to the id
    tie-break."""
    scores = dsir_scores(docs, target, text_col, id_col, n_buckets)
    picked = (
        scores.filter(~F.col("is_target") & F.col("logw").isNotNull())
        .withColumn("logw6", F.round("logw", 6))
        .orderBy(F.desc("logw6"), F.col(id_col))
        .limit(top_k)
    )
    rank_win = Window.orderBy(F.desc("logw6"), F.col(id_col))
    return picked.select(
        F.col(id_col),
        "n_feats",
        "logw6",
        F.row_number().over(rank_win).alias("rank"),
    )
