"""Rotation-discipline guard (VERDICT r02 #8): the driver checks only the
FIRST 50 queries() entries per round. This test makes dropping a
never-checked query out of the window a test failure instead of a silent
verification gap: every queries() key must have a driver row in a past
round's CORRECTNESS file, sit inside the current 50-entry window, or be
explicitly ledgered for the next rotation.

No Spark session — dict/JSON only.
"""

import json
import os

import __spark_entry__ as e

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Entries awaiting the NEXT rotation (mirrors the ledger comment in
# queries()). Empty after the r03 window absorbed all r03-new operators;
# new queries added mid-round go here until their rotation.
PENDING_NEXT_ROTATION: set = set()


def _driver_rows() -> set:
    seen = set()
    for fn in os.listdir(HERE):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            seen |= set(json.load(open(os.path.join(HERE, fn))))
    return seen


def test_every_query_is_driver_checked_or_ledgered():
    names = list(e.queries())
    window = set(names[:50])
    covered = _driver_rows() | window | PENDING_NEXT_ROTATION
    missing = [n for n in names if n not in covered]
    assert not missing, (
        f"queries() entries with NO driver row, outside the 50-entry "
        f"window, and not ledgered for rotation: {missing}")


def test_pending_set_matches_reality():
    # entries ledgered as pending must actually exist and actually lack
    # a driver row (else the ledger is stale)
    names = set(e.queries())
    assert PENDING_NEXT_ROTATION <= names
    stale = PENDING_NEXT_ROTATION & _driver_rows()
    assert not stale, f"ledgered-as-pending but already driver-checked: {stale}"


def test_window_holds_the_r03_priorities():
    """The r03 window must contain the 2 probes, the 13 r02-new
    never-checked queries, the 5 r02 hash-reds, and the 11 r03-new
    operators."""
    window = set(list(e.queries())[:50])
    probes = {"q_probe_hugeint", "q_probe_event_micros",
              "q_probe_q12_filter"}
    r02_new = {"q_substring_spans", "q_unigram_lm", "q_linear_quality",
               "q_global_rank_scan", "q_bigram_lm", "q_kmeans",
               "q_map_stream", "q_chunk_documents", "q_topk_window",
               "q_rank_by_value", "q_decontaminate", "q_pack_shards",
               "q_domain_cap"}
    reds = {"q12_priority_by_flag", "q_pii_redact", "q_top_word_fraction",
            "q_asof_join", "q_range_join"}
    r03_new = {"q_train_quality", "q_weighted_sample", "q_mix_proportions",
               "q_dedup_against", "q_pack_sequences",
               "q_top_bigram_fraction", "q_gopher_quality", "q_bm25_search",
               "q_semantic_dedup", "q_corpus_stats", "q_collocations",
               "q_dedup_keep_best", "q_cut_spans", "q_cube_agg",
               "q_ntile_ranks", "q_bloom_anti_join", "q_dsir_weights",
               "q_winnow_fingerprints", "q_winnow_overlap",
               "q_ccnet_buckets", "q_top_fraction", "q_corpus_kl",
               "q_fuzzy_join"}
    assert probes | r02_new | reds | r03_new <= window


def test_no_duplicate_query_keys():
    """The rotation moves entries between the window and the tail; a key
    accidentally left in both places silently shadows (dict literal keeps
    the LAST) and shrinks the effective window."""
    import ast, inspect
    src = inspect.getsource(e.queries)
    d = next(n for n in ast.walk(ast.parse(src)) if isinstance(n, ast.Dict))
    keys = [k.value for k in d.keys]
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate queries() keys: {dupes}"
