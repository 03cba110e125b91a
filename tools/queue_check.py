"""Registration-queue integrity check — computed, not asserted (the
staleness.py discipline applied to the unit-gated operator queue).

ROTATION_r07.md promises every queued operator ships a generated
oracle, cross-engine tests, a fuzz family, a BENCH_QUEUED row, and
(since late r7) a physical-plan audit, so that registering it later
is "writing the @register block, nothing more".  This tool makes the
promise checkable: the queue manifest lives HERE as data, and the
round checklist runs `python tools/queue_check.py` (exit 1 on any
missing artifact) instead of trusting the rotation prose.

Checks per queued operator:
  1. the operator function imports;
  2. its oracle generator imports (None = documented exemption,
     printed);
  3. its test file exists under tests/;
  4. its fuzz family is registered in tools/fuzz_portables.py;
  5. its bench key appears in BENCH_QUEUED.json under BOTH sf dirs;
  6. tests/test_plans_queued.py references the operator (plan audit).
"""

from __future__ import annotations

import importlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OPS = "survivor_processing_spark.operators"

# (operator, oracle, module, test file, fuzz family, bench key)
# r8 registrations REMOVED from the queue (now driver-gated with
# @register blocks): bpe_train(->bpe_train_portable),
# pagerank_portable, substring_dedup_spans, bfs_levels.
# r9 registrations REMOVED likewise: substring_dedup_clean,
# bpe_token_budget, read_snapshot(->snapshot_summary),
# stream_interval_join, sq8_encode(->sq8_summary),
# content_fingerprint.
# r10 registrations REMOVED likewise: pq_train_encode, pq_adc_topk,
# stratified_exact_split, triangle_counts, build_zonemap,
# ols_trend_exact, semantic_decontaminate.
# r11 registrations REMOVED likewise (VERDICT r10 #1/#3):
# delete_from_snapshot (-> q:snapshot_dml), stream_into_snapshot
# (-> q:stream_snapshot_ingest), delete_from_snapshot_mor
# (-> q:snapshot_mor), inverted_postings, bm25_doc_term_scores.
# oracle None = documented exemption; bench None = covered by a
# sibling's bench row (stated in the notes column of ROTATION_r07.md)
# r12 registrations REMOVED likewise (VERDICT r11 #1 + the r11
# containment adjudication, VERDICT r11 "What's wrong" #1):
# ngram_containment_pairs, ngram_coverage_score, interpolate_linear,
# nfc_normalize_text, dice_collocations, bigram_fluency,
# url_canonicalize.
# r13 registrations REMOVED likewise (VERDICT r12 #2/#3/#6):
# upsert_into_snapshot_mor (-> q:snapshot_mor_upsert),
# read_snapshot_asof (-> q:snapshot_time_travel),
# dsir_importance_weights (-> q:dsir_weights),
# strip_boilerplate_paragraphs (-> q:boilerplate_strip),
# winsorize_group_stats, mad_outlier_stats, k_anonymity_stats.
QUEUE = [
    ("crawl_schedule_summary", "crawl_schedule_oracle", f"{OPS}.crawlplan", "test_crawlplan.py", "crawlplan", "crawl_schedule"),
    # queued r13 net-new 1 of cap 5 (= registrations 7 − 2): Unicode
    # script-composition stats — the mixed-script/wrong-langid
    # curation signal (CCNet/RefinedWeb gate class); one shared range
    # table emits the Java AND RE2 classes, map-only projection
    ("script_mix_stats", "script_mix_oracle", f"{OPS}.scripts", "test_script_mix.py", "script_mix", "script_mix"),
    # queued r13 net-new 2 of cap 5: encoding-damage (mojibake)
    # detection — U+FFFD / C1-control / UTF-8-as-cp1252 digraph
    # counts + integer damage lane; the curation pass that flags
    # mangled docs before they poison near-dup clusters
    ("mojibake_stats", "mojibake_oracle", f"{OPS}.mojibake", "test_mojibake.py", "mojibake", "mojibake"),
    ("rendezvous_summary", "rendezvous_oracle", f"{OPS}.sharding", "test_sharding.py", "sharding", "rendezvous"),
    # unit-only BY CHOICE (semantics twin of gated q:funnel_stage_counts)
    ("funnel_steps", "funnel_oracle", f"{OPS}.funnel", "test_funnel.py", "funnel", "funnel_steps"),
    # apng/avi: bytes-level codecs (not DataFrame ops — no plan to
    # audit); gated through the registered multimodal queries'
    # dispatch, whose plans tests/test_plans.py covers
    ("apng_frames", None, f"{OPS}.multimodal", "test_apng.py", None, None),
    ("avi_mjpeg_frames", None, f"{OPS}.multimodal", "test_mjpeg.py", None, None),
]

PLAN_AUDIT_EXEMPT = {"apng_frames", "avi_mjpeg_frames"}


def main() -> int:
    with open(os.path.join(REPO, "BENCH_QUEUED.json")) as f:
        bench = json.load(f)["sf_dirs"]
    with open(os.path.join(REPO, "tools", "fuzz_portables.py")) as f:
        fuzz_src = f.read()
    with open(
        os.path.join(REPO, "tests", "test_plans_queued.py")
    ) as f:
        plans_src = f.read()

    bad = 0
    for fn, oracle, module, test, fam, bkey in QUEUE:
        probs = []
        try:
            mod = importlib.import_module(module)
            if not callable(getattr(mod, fn, None)):
                probs.append(f"operator {fn} missing in {module}")
            if oracle is not None and not callable(
                getattr(mod, oracle, None)
            ):
                probs.append(f"oracle {oracle} missing in {module}")
        except ImportError as exc:
            probs.append(f"import failed: {exc}")
        if not os.path.exists(os.path.join(REPO, "tests", test)):
            probs.append(f"test file tests/{test} missing")
        if fam is not None and f'("{fam}", fuzz_' not in fuzz_src:
            probs.append(f"fuzz family {fam!r} not in dispatcher")
        if bkey is not None:
            for d, rows in bench.items():
                if bkey not in rows:
                    probs.append(f"bench key {bkey!r} missing for {d}")
        if (
            fn not in PLAN_AUDIT_EXEMPT
            and module.rsplit(".", 1)[-1] not in plans_src
            and fn not in plans_src
        ):
            probs.append("no plan audit reference in test_plans_queued.py")
        if probs:
            bad += 1
            print(f"INCOMPLETE {fn}:")
            for p in probs:
                print(f"  - {p}")
    n = len(QUEUE)
    print(f"queue_check: {n - bad}/{n} complete")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
