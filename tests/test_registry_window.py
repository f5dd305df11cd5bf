"""Driver-window contract: the driver evaluates the FIRST 50
registered gates (dict insertion order). Pin the window's invariants
so a refactor can never silently shrink driver coverage or push a
never-driver-checked gate back past the boundary."""

import __spark_entry__ as entry_mod
from solrplugins_spark.registry import _WINDOW_ORDER

# every gate first registered in r05 — none has a prior driver row, so
# all of them must sit inside the window this round
R05_FIRST_TIMERS = {
    "wand_delete",
    "wand_update",
    "wand_boosted_fn",
    "explain_score",
    "session_transcripts",
    "tfidf_vectors",
    "lm_quality",
    "ppl_buckets",
    "mixture_sample",
    "source_cap",
    "dup_spans",
    "dedup_substring",
    "dedup_lines",
    "cursor_page",
    "collapse_field",
    "wand_collapse",
    "rerank",
    "wand_rerank",
    "facet_range",
    "wand_facet_range",
    "field_stats",
    "wand_stats",
    "highlight",
    "elevation",
    "wand_elevation",
    "grouping",
    "wand_grouping",
    "join_query",
    "wand_join",
    "dismax",
    "terms_enum",
    # registered in r04 past that round's window; first driver row r05
    "chunk_docs",
    "epoch_shard",
    "ann_ivf",
    "classic_lossy_norm",
}

# r06 first-timers: packed-tier dictionary surfaces + content-stream
# /mlt — no driver row yet, must be in-window this round. The r05
# first-timers above each have exactly ONE green driver row (r05), and
# the rotation policy requires >=2 before rotating out, so they must
# ALL stay in-window for r06 too.
R06_FIRST_TIMERS = {
    "wand_terms_enum",
    "wand_spellcheck",
    "wand_suggest",
    "mlt_text",
    # facet.query / stats.facet / sloppy-phrase serving components
    "facet_query",
    "wand_facet_query",
    "stats_facet",
    "wand_stats_facet",
    "phrase_slop",
    "wand_phrase_slop",
}


def test_window_order_is_registration_order():
    names = list(entry_mod.queries())
    assert names[: len(_WINDOW_ORDER)] == _WINDOW_ORDER


def test_window_has_no_duplicates_and_covers_all_gates():
    assert len(_WINDOW_ORDER) == len(set(_WINDOW_ORDER))
    assert set(entry_mod.queries()) == set(_WINDOW_ORDER)


def test_first_timers_inside_driver_window():
    window = set(_WINDOW_ORDER[:50])
    missing = (R05_FIRST_TIMERS | R06_FIRST_TIMERS) - window
    assert not missing, f"gates needing a driver row past the window: {missing}"


def test_every_window_gate_is_oracle_paired():
    oracles = entry_mod.oracle_sql()
    unpaired = [n for n in _WINDOW_ORDER[:50] if n not in oracles]
    assert not unpaired, f"window gates without a DuckDB oracle: {unpaired}"
