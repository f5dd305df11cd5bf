"""update_docs — Solr's updateDocument over a streamed packed store.

The reference assumes Solr's update-by-uniqueKey beneath every handler
(IndexWriter.updateDocument = delete old version + add new doc under a
FRESH internal docid; readers flip atomically; merges purge the dead
version). Here the uniqueKey → internal-id map is the ``keymap``
sidecar written per generation, prior versions tombstone via
``delete_docs``, the new versions commit as a new generation, and
``compact_packed`` purges physically.
"""

import os

import pandas as pd
import pytest

from solrplugins_spark.index.segments import (
    SegmentIndex,
    compact_packed,
    fetch_docs,
    live_docs,
    wand_search_multi,
)
from solrplugins_spark.streaming.incremental import (
    compact_generations,
    packed_generations,
    process_generation,
    update_docs,
)

KEYS = ("conv_id", "turn_idx")


def _search(spark, gens, terms, k=10):
    return (
        wand_search_multi(spark, gens, terms, k=k)
        .toPandas()
        .sort_values("score", ascending=False)
        .reset_index(drop=True)
    )


@pytest.fixture()
def store(spark, tiny_corpus_pd, tmp_path):
    """Two committed generations (split by conv hash) with keymaps."""
    path = str(tmp_path / "store")
    pdf = tiny_corpus_pd.copy()
    half = len(pdf) // 2
    for gen, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        process_generation(
            spark.createDataFrame(part),
            gen,
            path,
            pack=True,
            seg_size=64,
            seg_groups=2,
            store_cols=["text"],
            key_cols=KEYS,
        )
    return path


def _updated_batch(spark, tiny_corpus_pd, keys_pd, new_term="zephyrupdate"):
    """New versions: original text with a planted marker term."""
    batch = tiny_corpus_pd.merge(keys_pd, on=list(KEYS))
    batch = batch.copy()
    batch["text"] = batch["text"] + f" {new_term} {new_term}"
    return spark.createDataFrame(batch.drop(columns=["doc_id"]))


def test_update_replaces_across_generations(spark, tiny_corpus_pd, store):
    # pick victims straddling both generations
    half = len(tiny_corpus_pd) // 2
    victims = pd.concat(
        [tiny_corpus_pd.iloc[[0, 5]], tiny_corpus_pd.iloc[[half + 1, half + 7]]]
    )
    old_ids = set(victims["doc_id"].astype(int))
    batch = _updated_batch(spark, tiny_corpus_pd, victims[list(KEYS)])
    res = update_docs(
        spark, store, batch, key_cols=KEYS, seg_size=64, seg_groups=2,
        store_cols=["text"],
    )
    assert res["generation"] == 2
    assert res["n_docs"] == 4
    assert res["n_replaced"] == 4
    assert set(res["replaced_by_gen"]) == {0, 1}

    gens = packed_generations(store)
    assert len(gens) == 3
    # the marker term finds exactly the four NEW ids — all above the
    # high-water mark, never a recycled id
    hits = _search(spark, gens, [("zephyrupdate", 1.0)])
    assert len(hits) == 4
    assert set(hits["doc_id"]) & old_ids == set()
    assert (hits["doc_id"] >= res["id_offset"]).all()

    # old versions are invisible: a term query that used to match a
    # victim returns the new id, not the old one
    seed_term = str(
        tiny_corpus_pd.iloc[0]["text"].lower().split()[0]
    )
    got = _search(spark, gens, [(seed_term, 1.0)], k=10_000)
    assert set(got["doc_id"]) & old_ids == set()

    # docstore serves the NEW text for the new id
    new_id = int(hits["doc_id"].iloc[0])
    page = fetch_docs(spark, gens, [new_id]).toPandas()
    assert "zephyrupdate" in page["text"].iloc[0]


def test_update_inserts_new_keys(spark, tiny_corpus_pd, store):
    fresh = pd.DataFrame(
        {
            "conv_id": ["c_new"],
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"],
            "text": ["brand new quartzinsert document"],
            "tool": [""],
            "ts": [tiny_corpus_pd["ts"].iloc[0]],
        }
    )
    batch = spark.createDataFrame(fresh)
    res = update_docs(
        spark, store, batch, key_cols=KEYS, seg_size=64, seg_groups=2
    )
    assert res["n_replaced"] == 0 and res["n_docs"] == 1
    hits = _search(spark, packed_generations(store), [("quartzinsert", 1.0)])
    assert len(hits) == 1


def test_second_update_of_same_key(spark, tiny_corpus_pd, store):
    victim = tiny_corpus_pd.iloc[[3]]
    b1 = _updated_batch(spark, tiny_corpus_pd, victim[list(KEYS)], "epochone")
    update_docs(spark, store, b1, key_cols=KEYS, seg_size=64, seg_groups=2)
    b2 = _updated_batch(spark, tiny_corpus_pd, victim[list(KEYS)], "epochtwo")
    res2 = update_docs(spark, store, b2, key_cols=KEYS, seg_size=64, seg_groups=2)
    # the second update tombstones exactly one live version (gen 2's)
    assert res2["n_replaced"] == 1
    gens = packed_generations(store)
    assert len(_search(spark, gens, [("epochone", 1.0)])) == 0
    assert len(_search(spark, gens, [("epochtwo", 1.0)])) == 1


def test_update_rejects_ambiguous_batch(spark, tiny_corpus_pd, store):
    batch = spark.createDataFrame(
        pd.concat([tiny_corpus_pd.iloc[[0]], tiny_corpus_pd.iloc[[0]]])
    )
    with pytest.raises(ValueError, match="multiple rows"):
        update_docs(spark, store, batch, key_cols=KEYS)


def test_update_requires_keymap(spark, tiny_corpus_pd, tmp_path):
    path = str(tmp_path / "nokeys")
    process_generation(
        spark.createDataFrame(tiny_corpus_pd.iloc[:50]),
        0,
        path,
        pack=True,
        seg_size=64,
        seg_groups=2,
    )
    with pytest.raises(ValueError, match="keymap"):
        update_docs(spark, path, spark.createDataFrame(tiny_corpus_pd.iloc[:1]))


def test_compact_purges_old_versions(spark, tiny_corpus_pd, store, tmp_path):
    victims = tiny_corpus_pd.iloc[[2, 9]]
    batch = _updated_batch(spark, tiny_corpus_pd, victims[list(KEYS)])
    update_docs(
        spark, store, batch, key_cols=KEYS, seg_size=64, seg_groups=2,
        store_cols=["text"],
    )
    gens = packed_generations(store)
    before = _search(spark, gens, [("zephyrupdate", 1.0)])

    comp = compact_packed(spark, gens, str(tmp_path / "compact"), groups=2)
    assert live_docs(comp.path)["n_deleted"] == 0
    after = (
        wand_search_multi(spark, [comp], [("zephyrupdate", 1.0)], k=10)
        .toPandas()
        .sort_values("score", ascending=False)
        .reset_index(drop=True)
    )
    assert list(after["doc_id"]) == list(before["doc_id"])

    # the flat-postings compaction path must refuse: it would
    # resurrect the tombstoned old versions
    with pytest.raises(ValueError, match="tombstones"):
        compact_generations(spark, store, str(tmp_path / "flatcompact"))
