"""Collection schema: per-field analyzers/similarities/boosts and
edismax-style multi-field search."""

import math

import pytest
from pyspark.sql import functions as F

from solrplugins_spark.query.scorer import BM25, PayloadOnly, Similarity
from solrplugins_spark.schema import (
    Collection,
    FieldConfig,
    Schema,
    build_collection,
    collection_search,
)


@pytest.fixture(scope="module")
def coll(spark):
    rows = [
        (0, "spark sql engine", "Big Data Title", "alpha^2.0"),
        (1, "spark streaming", "Spark Title", "alpha^0.5 beta^1.0"),
        (2, "other words here", "sql heavy title title", "beta^3.0"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, body string, title string, tags string")
    schema = Schema(
        fields={
            "body": FieldConfig(column="body", similarity=BM25, boost=1.0),
            "title": FieldConfig(
                column="title",
                similarity=Similarity(kind="bm25", k1=0.5, b=0.0),  # per-field k1/b
                boost=3.0,
            ),
            "tags": FieldConfig(column="tags", similarity=PayloadOnly, payload=True),
        },
        default_field="body",
    )
    return build_collection(docs, schema)


def test_per_field_indexes_built(coll):
    assert set(coll.indexes) == {"body", "title", "tags"}
    assert "payload" in coll.indexes["tags"].postings.columns
    # per-field stats differ
    assert coll.indexes["body"].avgdl != coll.indexes["title"].avgdl


def test_multi_field_search_sums_weighted_fields(coll):
    got = collection_search(coll, [("spark", 1.0)], k=3, fields=["body", "title"]).toPandas()
    scores = dict(zip(got["doc_id"], got["score"]))
    # doc1 matches 'spark' in BOTH fields; doc0 only in body
    assert scores[1] > scores[0]
    # manual check for doc0: body-only contribution
    bidx = coll.indexes["body"]
    row = bidx.postings.filter("term='spark' and doc_id=0").first()
    idf = math.log(1 + (bidx.n_docs - 2 + 0.5) / (2 + 0.5))
    tfp = 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * row["dl"] / bidx.avgdl))
    assert abs(scores[0] - round(idf * tfp, 5)) < 1e-4


def test_payload_field_scoring(coll):
    got = collection_search(coll, [("alpha", 1.0)], k=3, fields=["tags"]).toPandas()
    scores = dict(zip(got["doc_id"], got["score"]))
    assert scores == {0: 2.0, 1: 0.5}  # PayloadOnly = mean payload
