"""Scale measurement for the expansion operators (r14 + r15 tiers).

Runs the six expansion operators (winnow_overlap, dsir_select, semdedup,
bloom_probe, cms_topgrams, contamination_spans) at the generated sf1
text scale (documents ×10 of sf0.1; embeddings as generated) and at
sf0.1, min-of-N walls with the standard settle guard and host-probe
bracketing, and records per-query rows so the decade ratios are
interpretable. Artifact: ``.scale/R15_NEWOPS_SCALE.json``.

Run: ``python scripts/newops_scale.py [--runs N] [dirtag=DIR ...]
[query ...]`` (sf1 dir must exist — ``scripts/scale_gate.py`` /
``sf1_data.ensure_sf1`` builds it; bare query names filter the set).
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
from scripts.host_probe import probe  # noqa: E402
from scripts.measure import settle  # noqa: E402

QUERIES = {
    "winnow_overlap": entry_mod.q_winnow_overlap,
    "dsir_select": entry_mod.q_dsir_select,
    "semdedup": entry_mod.q_semdedup,
    "bloom_probe": entry_mod.q_bloom_probe,
    # r15 expansion rows (banked r16 fuel)
    "cms_topgrams": entry_mod.q_cms_topgrams,
    "contamination_spans": entry_mod.q_contamination_spans,
    # r15 boundary tiers (WARC ingest / tar shard export)
    "warc_extract": entry_mod.q_warc_extract,
    "tar_export": entry_mod.q_tar_export,
    "length_quantiles": entry_mod.q_length_quantiles,
    # r15 continuation pipeline tiers (banked r16+ fuel). NOTE on
    # bm25_topk: the GATE derivation scales query count with the corpus
    # (every 97th doc), and the saturated ~16-word vocabulary makes every
    # query match nearly every doc — the measured wall is the
    # O(queries×docs) score space, i.e. the designed worst case, not the
    # sparse-overlap shape of a real corpus. Disclosed so decade ratios
    # read correctly.
    "pii_audit": entry_mod.q_pii_audit,
    "gopher_filter": entry_mod.q_gopher_filter,
    "c4_clean": entry_mod.q_c4_clean,
    "bm25_topk": entry_mod.q_bm25_topk,
    "pmi_collocations": entry_mod.q_pmi_collocations,
    "sft_render": entry_mod.q_sft_render,
    "tfidf_keywords": entry_mod.q_tfidf_keywords,
    "intra_dedup": entry_mod.q_intra_dedup,
}


def main() -> int:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    args = sys.argv[1:]
    if "--runs" in args:
        i = args.index("--runs")
        args = args[:i] + args[i + 2 :]
    explicit = [a for a in args if "=" in a]
    names = [a for a in args if "=" not in a and not a.startswith("-")]
    if names:  # bare names filter the measured query set
        global QUERIES
        QUERIES = {k: v for k, v in QUERIES.items() if k in names}
    if explicit:  # e.g. sf10=/root/repo/.scale/sf10 — measure only these
        dirs = dict(a.split("=", 1) for a in explicit)
    else:
        sf1 = os.path.join(REPO, ".scale", "sf1")
        dirs = {"sf0.1": "/root/testdata/sf0.1"}
        if os.path.isdir(sf1):
            dirs["sf1"] = sf1
        else:
            print(
                f"sf1 dir missing ({sf1}) — measuring sf0.1 only",
                file=sys.stderr,
            )
    spark = get_spark("newops-scale")
    out: dict = {"runs": runs, "probe_pre": probe(spark, tag="newops_pre")}
    for tag, d in dirs.items():
        for name, fn in QUERIES.items():
            waited = settle()
            walls, rows = [], None
            for _ in range(runs):
                t0 = time.monotonic()
                rows = fn(spark, d).count()
                walls.append(round(time.monotonic() - t0, 3))
                release_intermediate_caches()
            out[f"{tag}:{name}"] = {
                "rows": rows,
                "walls": walls,
                "min_wall": min(walls),
                "settle_waited_s": waited,
                "loadavg": round(os.getloadavg()[0], 2),
            }
            print(json.dumps({f"{tag}:{name}": out[f"{tag}:{name}"]}),
                  file=sys.stderr)
    out["probe_post"] = probe(spark, tag="newops_post")
    suffix = "_" + "_".join(sorted(dirs)).upper().replace(".", "") if explicit else ""
    if names:  # subset runs get their own artifact, never clobber the full one
        suffix += "_" + "_".join(sorted(names)).upper()
    path = os.path.join(REPO, ".scale", f"R15_NEWOPS_SCALE{suffix}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"json": path}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
