"""Anchor the prefix plan's OWN scaling curve (r12 VERDICT ask #2).

The sf10 decade's `ngram_jaccard` ratio (50.3x for 10x data) compares two
DIFFERENT plans: at sf1 the Σdf² probe picks the count plan (4.0 s), at
sf10 it flips to the prefix plan (200.7 s) — a documented plan flip, not
quadratic blowup, but the prefix plan's own curve was unmeasured. This
script runs `ngram_jaccard_pairs(method='prefix')` at sf1 (bypassing the
probe — the same plan the sf10 row executed) and `dedup_clusters` over
that prefix-pair relation, then records both as `sf1_prefix` rows with a
`ratio_10x_same_plan` field next to the existing sf10 readings in
``.scale/SCALE_SMOKE_SF10.json`` — so the decade decomposes into plan-flip
cost vs genuine scaling.

Also re-reads `doc_profile` at sf10 quiet (min-of-3) per the protocol that
corrected `quality_score` (the committed 7.34x was taken at loadavg 15.7).

Run AFTER other gates are done (quiet box): ``python scripts/prefix_anchor.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402

from coin_for_rich_spark.llmdata.dedup import (  # noqa: E402
    dedup_clusters,
    ngram_jaccard_pairs,
    pick_canonical,
    release_intermediate_caches,
)
from coin_for_rich_spark.session import get_spark  # noqa: E402
from coin_for_rich_spark.sources import load_table  # noqa: E402
from scripts.measure import settle  # noqa: E402

SF1 = os.path.join(REPO, ".scale", "sf1")
SF10 = os.path.join(REPO, ".scale", "sf10")
ARTIFACT = os.path.join(REPO, ".scale", "SCALE_SMOKE_SF10.json")


def _timed(build_df, n_passes: int = 2) -> dict:
    """scale_smoke's protocol: one untimed warm pass (fs cache/codegen),
    then min-of-N noop-writer walls with intermediate caches dropped
    between passes so each pass measures the plan."""
    release_intermediate_caches()
    rows = build_df().count()
    wall = None
    for _ in range(n_passes):
        release_intermediate_caches()
        t0 = time.perf_counter()
        build_df().write.format("noop").mode("overwrite").save()
        t = time.perf_counter() - t0
        wall = t if wall is None else min(wall, t)
    return {"sec": round(wall, 3), "rows": rows}


def main() -> int:
    spark = get_spark("coin_for_rich_spark-prefix-anchor")
    for d in (SF1, SF10):
        if not os.path.isdir(d):
            print(f"missing {d} — run scripts/sf1_data.py composition first",
                  file=sys.stderr)
            return 1
    docs_sf1 = load_table(spark, SF1, "documents")
    docs_sf1.count()  # warm
    settle(max_load=2.0, timeout_s=300.0)
    loadavg_pre = round(os.getloadavg()[0], 2)

    def prefix_pairs():
        return ngram_jaccard_pairs(docs_sf1, threshold=0.2, method="prefix")

    anchor_pairs = _timed(prefix_pairs)

    def clusters_over_prefix():
        pairs = prefix_pairs()
        clusters = dedup_clusters(pairs, method="star")
        keep = pick_canonical(clusters, docs_sf1).select("cluster_id", "keep_id")
        return clusters.join(keep, "cluster_id").select(
            "doc_id", "cluster_id", "cluster_size", "keep_id"
        )

    anchor_clusters = _timed(clusters_over_prefix)

    # quiet min-of-3 re-read of the one >5x row measured under load (the
    # quality_score correction protocol; loadavg disclosed per reading)
    quiet_doc_profile = _timed(
        lambda: entry_mod.queries()["doc_profile"](spark, SF10), n_passes=3
    )
    quiet_doc_profile["loadavg_pre"] = round(os.getloadavg()[0], 2)

    with open(ARTIFACT) as fh:
        art = json.load(fh)
    res = art["results"]

    nj = res["ngram_jaccard"]
    nj["sf1_prefix"] = {**anchor_pairs, "loadavg_pre": loadavg_pre}
    nj["ratio_10x_same_plan"] = round(nj["sf10"]["sec"] / anchor_pairs["sec"], 2)
    nj["note_same_plan"] = (
        "r13 anchor: method='prefix' forced at sf1 so the decade compares "
        "like to like — ratio_10x (50.3) was count-plan-sf1 vs "
        "prefix-plan-sf10 (a documented plan flip); ratio_10x_same_plan is "
        "the prefix plan's own curve. The true-pair OUTPUT grows "
        "superlinearly across this decade (sf1 2,560 -> sf10 75,208 pairs "
        "= 29.4x for 10x docs), so compare the ratio against the 29.4x "
        "output growth, not 10x."
    )

    dc = res["dedup_clusters"]
    dc["sf1_prefix"] = {**anchor_clusters, "loadavg_pre": loadavg_pre}
    dc["ratio_10x_same_plan"] = round(
        dc["sf10"]["sec"] / anchor_clusters["sec"], 2
    )
    dc["note_same_plan"] = (
        "r13 anchor: consumes the prefix-forced pair relation at sf1 — the "
        "same basis as the sf10 reading (where auto flipped to prefix). "
        "Cluster-edge volume grows with true-pair volume (29.4x), not data "
        "size."
    )

    dp = res["doc_profile"]
    dp["sf10_quiet"] = quiet_doc_profile
    dp["ratio_10x_quiet"] = round(
        quiet_doc_profile["sec"] / dp["sf1"]["sec"], 2
    )

    art["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(ARTIFACT, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps({
        "ngram_jaccard_sf1_prefix": nj["sf1_prefix"],
        "ngram_jaccard_ratio_10x_same_plan": nj["ratio_10x_same_plan"],
        "dedup_clusters_sf1_prefix": dc["sf1_prefix"],
        "dedup_clusters_ratio_10x_same_plan": dc["ratio_10x_same_plan"],
        "doc_profile_sf10_quiet": quiet_doc_profile,
        "doc_profile_ratio_10x_quiet": dp["ratio_10x_quiet"],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
