"""PII detection / redaction tier — typed classes + checksum validation.

The reference corpus is exchange market data and has no PII pass; this
tier covers the training-data-curation surface directly (every published
pre-training pipeline ships one: emails / URLs / IPs / phone numbers /
payment-card numbers detected, counted for the compliance audit, and
replaced by typed placeholder tokens). It upgrades the basic 3-pattern
``pipeline.scrub_text`` to a first-class audited operator:

- **Typed classes.** email, URL, IPv4 (octet-range-validated in the
  pattern itself), E.164-ish phone, payment-card candidate, long digit
  run. Every pattern is deliberately RE2-compatible — no lookaround, no
  backreference — so the IDENTICAL pattern string runs in Spark's Java
  regex and the DuckDB oracle's RE2 with identical leftmost-first match
  semantics (RE2's NFA simulation reproduces backtracking results for
  this pattern class).
- **Luhn checksum validation** for card candidates, in PURE column
  algebra: ``aggregate(sequence(1, len), 0, fold)`` over the reversed
  digit string, doubling every second digit with the >9 fold — no UDF,
  stays inside whole-stage codegen. A 13–19-digit run that passes Luhn
  is a near-certain real card number (the signal a compliance review
  keys on); one that fails is counted separately as card-LIKE noise.
- **Audit + redaction in one scan.** Per-class counts are computed
  INDEPENDENTLY on the raw text (so the audit is stable under pattern
  reordering); the redacted text applies the classes SEQUENTIALLY in a
  documented order (email → url → ipv4 → card → phone → num) so a URL
  containing an IP redacts as one ``<URL>``, not a torn mix.

100 TB posture: one ``select`` — per-row column algebra in the scan
stage, zero exchanges, zero Python UDFs (pinned by tests/test_pii.py).
At cluster scale this composes in front of ``corpus_curation`` the same
way the Bloom contamination prefilter does: a scan-stage pass whose
cost is bounded by bytes read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-compatible pattern classes (shared verbatim with the DuckDB twin;
# single-quote-free so they inline into SQL literals unescaped).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^\s]+"
_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
PII_IPV4 = r"\b(?:" + _OCTET + r"\.){3}" + _OCTET + r"\b"
PII_PHONE = r"\+[0-9]{7,15}\b"
PII_CARD = r"\b[0-9](?:[ -]?[0-9]){12,18}\b"
PII_NUM = r"[0-9]{7,}"

# (name, pattern, token) in REDACTION order — the order is part of the
# operator contract (see module docstring) and mirrored in the oracle.
PII_CLASSES: tuple[tuple[str, str, str], ...] = (
    ("email", PII_EMAIL, "<EMAIL>"),
    ("url", PII_URL, "<URL>"),
    ("ipv4", PII_IPV4, "<IP>"),
    ("card", PII_CARD, "<CARD>"),
    ("phone", PII_PHONE, "<PHONE>"),
    ("num", PII_NUM, "<NUM>"),
)


def luhn_valid(digits: Column) -> Column:
    """True iff ``digits`` (a string of [0-9], length ≥ 1) passes the Luhn
    checksum. Pure column algebra: fold over the reversed string, doubling
    every second digit (1-indexed even positions from the right) with the
    standard ``2d − 9·[2d > 9]`` fold; valid iff the sum ≡ 0 (mod 10)."""
    rev = F.reverse(digits)

    def step(acc: Column, i: Column) -> Column:
        d = F.substr(rev, i, F.lit(1)).cast("int")
        doubled = d * 2
        folded = F.when(doubled > 9, doubled - 9).otherwise(doubled)
        return acc + F.when(i % 2 == 0, folded).otherwise(d)

    total = F.aggregate(F.sequence(F.lit(1), F.length(rev)), F.lit(0), step)
    return total % 10 == 0


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(f"({pattern})"), 1)).cast(
        "long"
    )


def pii_audit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document PII audit + redaction (module docstring for the
    contract). Returns ``(id, n_email, n_url, n_ipv4, n_card_valid,
    n_card_invalid, n_phone, n_num, redacted_text)`` — counts independent
    on the raw text, card candidates split by Luhn, redaction sequential
    in ``PII_CLASSES`` order. One select, zero shuffles, zero UDFs."""
    t = F.col(text_col)

    cards = F.transform(
        F.regexp_extract_all(t, F.lit(f"({PII_CARD})"), 1),
        lambda c: F.regexp_replace(c, "[ -]", ""),
    )
    n_card_valid = F.size(F.filter(cards, luhn_valid)).cast("long")
    n_card_total = F.size(cards).cast("long")

    redacted = t
    for _, pattern, token in PII_CLASSES:
        redacted = F.regexp_replace(redacted, pattern, token)

    return docs.select(
        F.col(id_col),
        _count(t, PII_EMAIL).alias("n_email"),
        _count(t, PII_URL).alias("n_url"),
        _count(t, PII_IPV4).alias("n_ipv4"),
        n_card_valid.alias("n_card_valid"),
        (n_card_total - n_card_valid).alias("n_card_invalid"),
        _count(t, PII_PHONE).alias("n_phone"),
        _count(t, PII_NUM).alias("n_num"),
        redacted.alias("redacted_text"),
    )


def pii_oracle_exprs(text_sql: str = "text") -> dict[str, str]:
    """DuckDB SQL fragments mirroring :func:`pii_audit` column-for-column
    — the twin builds its SELECT list from these so pattern strings can
    never drift between engines. Luhn is the same fold written with
    ``list_transform``/``list_sum`` over ``range(1, len+1)``."""

    def cnt(pattern: str) -> str:
        return f"CAST(len(regexp_extract_all({text_sql}, '{pattern}')) AS BIGINT)"

    luhn = (
        "list_sum(list_transform(range(1, length(c) + 1), i -> CASE "
        "WHEN i % 2 = 0 THEN CASE "
        "WHEN 2 * CAST(substr(reverse(c), CAST(i AS INT), 1) AS INT) > 9 "
        "THEN 2 * CAST(substr(reverse(c), CAST(i AS INT), 1) AS INT) - 9 "
        "ELSE 2 * CAST(substr(reverse(c), CAST(i AS INT), 1) AS INT) END "
        "ELSE CAST(substr(reverse(c), CAST(i AS INT), 1) AS INT) END)) % 10 = 0"
    )
    cards = (
        f"list_transform(regexp_extract_all({text_sql}, '{PII_CARD}'), "
        "x -> regexp_replace(x, '[ -]', '', 'g'))"
    )
    n_valid = (
        f"CAST(len(list_filter({cards}, c -> {luhn})) AS BIGINT)"
    )
    redacted = text_sql
    for _, pattern, token in PII_CLASSES:
        redacted = f"regexp_replace({redacted}, '{pattern}', '{token}', 'g')"
    return {
        "n_email": cnt(PII_EMAIL),
        "n_url": cnt(PII_URL),
        "n_ipv4": cnt(PII_IPV4),
        "n_card_valid": n_valid,
        "n_card_invalid": f"CAST(len({cards}) AS BIGINT) - {n_valid}",
        "n_phone": cnt(PII_PHONE),
        "n_num": cnt(PII_NUM),
        "redacted_text": redacted,
    }
