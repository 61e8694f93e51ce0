"""Web-corpus preprocessing: HTML → text extraction and URL
canonicalization — the step between a raw crawl and every text operator in
this package (a pretraining corpus usually arrives as HTML + URL, not
clean text).

Both operators are pure column algebra (regexp/parse_url chains — per-row,
no shuffle, scan-stage), deliberately deterministic and engine-portable:
no HTML parser library, so the extraction is the pragmatic
tag-strip/boilerplate-drop tier (the fidelity of a WET file, not a DOM
walk — a real DOM-accurate readability pass is a different, library-bound
operator and is out of scope by the same honesty rule as the codec
boundaries). What it DOES do is exactly specified and test-pinned:

- drop ``<script>``/``<style>``/``<noscript>``/``<template>`` blocks and
  HTML comments wholesale (content AND tags — the classic contamination
  source when tag-stripping naively);
- turn block-level boundaries (``</p>``, ``<br>``, headings, ``</div>``,
  ``</li>``, ``</tr>``…) into newlines so downstream line-level dedup
  (:func:`~.dedup.line_dedup` with ``explode_lines``) sees real line
  structure;
- strip every remaining tag, decode the common entities, collapse
  whitespace per line, drop empty lines.

URL canonicalization produces the identity key URL-level dedup and
per-domain mixing group by: lowercase scheme/host, strip default ports,
fragments, tracking parameters (utm_*, gclid, fbclid, ref), trailing
slashes, and a leading ``www.`` — the standard crawl-dedup key rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# blocks whose CONTENT must go, not just the tags
_DROP_BLOCKS = ("script", "style", "noscript", "template")

# closing (or void) tags that end a visual block → newline
_BLOCK_BREAK = (
    r"</(?:p|div|li|tr|h[1-6]|ul|ol|table|section|article|header|footer|"
    r"blockquote|pre|figure)>|<br\s*/?>|<hr\s*/?>"
)

# '&amp;' decodes LAST: decoding it first would turn '&amp;lt;' into
# '&lt;' and then a later pass into '<' — the classic double-decode that
# resurrects author-escaped markup
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def html_text(html_col: Column | str) -> Column:
    """The extraction as a single reusable column expression."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    for tag in _DROP_BLOCKS:
        c = F.regexp_replace(c, rf"(?is)<{tag}\b[^>]*>.*?</{tag}>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    # source newlines are plain whitespace in HTML — flatten them BEFORE
    # block-break conversion, or the markup's indentation would masquerade
    # as line structure
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.regexp_replace(c, rf"(?i){_BLOCK_BREAK}", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    # entities AFTER tag-stripping: '&lt;b&gt;' must not become a tag
    for ent, rep in _ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"&#(\d+);", " ")  # numeric entities → space
    # collapse within lines, then drop blank lines
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    return F.trim(c)


def extract_html_text(
    docs: DataFrame,
    html_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, extracted_text, n_lines) — newline-structured plain text
    ready for the line-level dedup / profiling ladder."""
    t = html_text(html_col)
    return docs.select(
        F.col(id_col),
        t.alias("extracted_text"),
        F.when(t.isNull() | (t == ""), 0)
        .otherwise(F.size(F.split(t, "\n")))
        .alias("n_lines"),
    )


_TRACKING_PARAMS = r"(?:utm_[a-z]+|gclid|fbclid|ref|mc_cid|mc_eid)"


def canonical_url(url_col: Column | str) -> Column:
    """The crawl-dedup identity key for a URL, as one column expression:
    lowercase scheme+host, default ports and fragments stripped, tracking
    query parameters removed and the REMAINING params sorted (the standard
    crawl-canon rule: ``?a=1&b=2`` and ``?b=2&a=1`` are one resource — the
    higher-order split/filter/rejoin makes the sort free), trailing slash
    and leading ``www.`` dropped. NULL stays NULL; a string with no
    ``://`` is returned trimmed-lowercased as-is (opaque id passthrough)."""
    c = F.trim(F.col(url_col) if isinstance(url_col, str) else url_col)
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    host = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    # default ports are scheme-specific: http://h:443 is NOT canonical h
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    raw_tail = F.regexp_replace(rest, r"^[^/?]+", "")
    # split at the FIRST '?' (limit-2 split: '?' inside parameter VALUES is
    # data, not structure), filter tracking params out of the query piece,
    # and rejoin. Strip-then-patch regexes destroy the path/query boundary:
    # a literal '&' in the PATH ('/a&b?utm=x&c=1') or a leading tracking
    # param with 2+ kept params both forked equivalent URLs under them.
    parts = F.split(raw_tail, r"\?", 2)
    path = F.regexp_replace(parts.getItem(0), r"/$", "")  # trailing slash
    query = F.when(F.size(parts) > 1, F.element_at(parts, 2))
    # naive tag appenders glue '?utm_...' onto an existing query
    # ('?a=1?utm_source=x'): a second '?' IMMEDIATELY followed by a known
    # tracking param is a separator in disguise — but only then; a '?'
    # inside an ordinary value ('?next=/home/?tab=1') stays data
    query = F.regexp_replace(query, rf"\?(?={_TRACKING_PARAMS}=)", "&")
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(f"^{_TRACKING_PARAMS}="),
        )
    )
    tail = F.when(
        kept.isNotNull() & (F.size(kept) > 0),
        F.concat(path, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(path)
    canon = F.concat(scheme, F.lit("://"), host, tail)
    return F.when(c.isNull(), F.lit(None).cast("string")).when(
        scheme == "", F.lower(c)
    ).otherwise(canon)


def canonicalize_urls(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, url, canonical_url, domain) — the dedup key plus the
    mixing/grouping domain."""
    canon = canonical_url(url_col)
    return docs.select(
        F.col(id_col),
        F.col(url_col),
        canon.alias("canonical_url"),
        F.regexp_extract(canon, r"^[a-z0-9+.-]+://([^/?]+)", 1).alias("domain"),
    )


# ------------------------------------------------------------- mojibake
#
# UTF-8 text mis-decoded as Latin-1 ("café" -> "cafÃ©")
# is the classic crawl corruption. Because Latin-1 maps bytes to code
# points 1:1, a mojibake'd string's CHARACTERS are exactly the original
# UTF-8 BYTES — so a character-class regex over the string IS an exact
# UTF-8 validator for the recoded bytes, and the repair (re-encode
# Latin-1, re-decode UTF-8) is total on rows that pass it. The gate
# matters: Spark 4's `decode` RAISES on malformed input
# (MALFORMED_CHARACTER_CODING), so an ungated recode of a corpus with
# one stray 'Ã' would fail the whole job.
#
# The validator transcribes RFC 3629's well-formed byte sequences
# (overlongs excluded via the C2 / E0-A0 / F0-90 floors, surrogates via
# the ED-9F cap, > U+10FFFF via the F4-8F cap) and requires at least ONE
# multi-byte sequence — an all-ASCII string round-trips identically and
# must not be flagged. Built programmatically so the source stays ASCII.


def _r(a: int, b: int | None = None) -> str:
    return f"\\u{a:04x}" if b is None else f"[\\u{a:04x}-\\u{b:04x}]"


_CONT = _r(0x80, 0xBF)  # one continuation byte
_UTF8_SEQ = (
    "(?:" + _r(0xC2, 0xDF) + _CONT
    + "|" + _r(0xE0) + _r(0xA0, 0xBF) + _CONT
    + "|" + _r(0xE1, 0xEC) + _CONT + "{2}"
    + "|" + _r(0xED) + _r(0x80, 0x9F) + _CONT
    + "|" + _r(0xEE, 0xEF) + _CONT + "{2}"
    + "|" + _r(0xF0) + _r(0x90, 0xBF) + _CONT + "{2}"
    + "|" + _r(0xF1, 0xF3) + _CONT + "{3}"
    + "|" + _r(0xF4) + _r(0x80, 0x8F) + _CONT + "{2}"
    + ")"
)
_ASCII = _r(0x00, 0x7F)
_MOJIBAKE_GATE = (
    "^(?:" + _ASCII + "|" + _UTF8_SEQ + ")*" + _UTF8_SEQ
    + "(?:" + _ASCII + "|" + _UTF8_SEQ + ")*$"
)


def fix_mojibake(text_col: Column | str) -> Column:
    """Repaired text: Latin-1 -> UTF-8 recode when (and only when) the
    string is a valid mojibake image — otherwise the input unchanged.
    One layer per application (double-encoded text needs two passes); a
    REPAIRED string no longer matches the gate, so the fix is stable."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(
        c.rlike(_MOJIBAKE_GATE),
        F.decode(F.encode(c, "ISO-8859-1"), "UTF-8"),
    ).otherwise(c)


def mojibake_audit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text, fixed_text, was_mojibake, n_chars_before,
    n_chars_after) — the repair plus the audit columns a curation run
    reports on. Pure per-row column algebra: zero exchanges, zero UDFs;
    the char-count delta equals the number of repaired sequences'
    continuation bytes."""
    fixed = fix_mojibake(text_col)
    return docs.select(
        F.col(id_col),
        F.col(text_col),
        fixed.alias("fixed_text"),
        (fixed != F.col(text_col)).alias("was_mojibake"),
        F.length(text_col).cast("long").alias("n_chars_before"),
        F.length(fixed).cast("long").alias("n_chars_after"),
    )
