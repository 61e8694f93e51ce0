"""Three-scale oracle proof for BANKED (undeclared) gate rows.

The rotation discipline requires a swap-in candidate to be committed and
proven at sf0.001 / sf0.01 / sf0.1 at least one round before it declares.
The driver's selfcheck only iterates ``queries()`` (declared rows), so
this script runs the named banked rows — each a ``q_*`` function with an
``_*_oracle_sql`` twin in ``__spark_entry__.py`` — through the SAME
``selfcheck.compare`` (bit-exact floats, order-insensitive canonical
form) at all three driver scales, and records the artifact the next
round's declaration cites.

Run: ``python scripts/banked_twins.py [name ...]`` (default: the current
banked set). Artifact: ``.scale/R15_BANKED_TWINS.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from coin_for_rich_spark.session import get_spark  # noqa: E402
from coin_for_rich_spark.llmdata.dedup import (  # noqa: E402
    release_intermediate_caches,
)
from selfcheck import compare, duck_connect  # noqa: E402

SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

#: banked rows: name -> (query fn, oracle-sql fn)
BANKED = {
    "cms_topgrams": (entry_mod.q_cms_topgrams, entry_mod._cms_topgrams_oracle_sql),
    "contamination_spans": (
        entry_mod.q_contamination_spans,
        entry_mod._contamination_spans_oracle_sql,
    ),
    "semdedup": (entry_mod.q_semdedup, entry_mod._semdedup_oracle_sql),
    "dsir_select": (entry_mod.q_dsir_select, entry_mod._dsir_select_oracle_sql),
    "bloom_probe": (entry_mod.q_bloom_probe, entry_mod._bloom_probe_oracle_sql),
    "video_keyframes_avc": (
        entry_mod.q_video_keyframes_avc,
        entry_mod._video_keyframes_avc_oracle_sql,
    ),
    "winnow_overlap": (
        entry_mod.q_winnow_overlap,
        entry_mod._winnow_overlap_oracle_sql,
    ),
    "warc_extract": (
        entry_mod.q_warc_extract,
        entry_mod._warc_extract_oracle_sql,
    ),
    "tar_export": (entry_mod.q_tar_export, entry_mod._tar_export_oracle_sql),
    "length_quantiles": (
        entry_mod.q_length_quantiles,
        entry_mod._length_quantiles_oracle_sql,
    ),
    "pii_audit": (entry_mod.q_pii_audit, entry_mod._pii_audit_oracle_sql),
    "gopher_filter": (
        entry_mod.q_gopher_filter,
        entry_mod._gopher_filter_oracle_sql,
    ),
    "c4_clean": (entry_mod.q_c4_clean, entry_mod._c4_clean_oracle_sql),
    "bm25_topk": (entry_mod.q_bm25_topk, entry_mod._bm25_topk_oracle_sql),
    "pmi_collocations": (
        entry_mod.q_pmi_collocations,
        entry_mod._pmi_collocations_oracle_sql,
    ),
    "sft_render": (entry_mod.q_sft_render, entry_mod._sft_render_oracle_sql),
    "tfidf_keywords": (
        entry_mod.q_tfidf_keywords,
        entry_mod._tfidf_keywords_oracle_sql,
    ),
    "intra_dedup": (
        entry_mod.q_intra_dedup,
        entry_mod._intra_dedup_oracle_sql,
    ),
    "hard_negatives": (
        entry_mod.q_hard_negatives,
        entry_mod._hard_negatives_oracle_sql,
    ),
}


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(BANKED)
    spark = get_spark("banked-twins")
    # a subset run MERGES into the standing artifact (a fresh dict here
    # would silently discard the other rows' standing proof)
    path = os.path.join(REPO, ".scale", "R15_BANKED_TWINS.json")
    out: dict = {"ts": time.time(), "results": {}}
    if set(names) != set(BANKED) and os.path.exists(path):
        with open(path) as fh:
            out["results"] = json.load(fh).get("results", {})
    failures = 0
    for sf_dir in SCALES:
        duck = duck_connect(sf_dir)
        for name in names:
            fn, osql = BANKED[name]
            t0 = time.monotonic()
            try:
                sdf = fn(spark, sf_dir).toPandas()
                odf = duck.execute(osql()).df()
                problems = compare(name, sdf, odf)
            except Exception as exc:  # noqa: BLE001
                problems = [f"error: {exc}"]
                sdf = None
            finally:
                release_intermediate_caches()
            wall = round(time.monotonic() - t0, 2)
            key = f"{os.path.basename(sf_dir)}:{name}"
            out["results"][key] = {
                "rows": None if sdf is None else len(sdf),
                "problems": problems,
                "wall_s": wall,
            }
            status = "PASS" if not problems else f"FAIL {problems}"
            print(f"{status} {key} ({out['results'][key]['rows']} rows, {wall}s)")
            if problems:
                failures += 1
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{failures} failures -> {path}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
