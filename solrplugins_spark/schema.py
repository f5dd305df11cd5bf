"""Collection schema: fields -> analyzer config + similarity.

The reference delegates this to Solr's schema.xml: every plugin asks
the schema for a field's analyzer and type
(MoreLikeThisHelper.java:79, PayloadAwareExtendDismaxQParser.java:41-47
routes on the field *type name* to decide payload scoring), and
per-field Similarity comes from SchemaSimilarityFactory (README.md:25).

Here a ``Schema`` is data: per-field tokenizer kwargs, a Similarity,
a payload flag, and a query-time field boost. ``build_collection``
materializes one index per field; ``collection_search`` is the
edismax-style disjunction: each query term scores against every
searched field with that field's similarity, weighted by the field
boost, summed per doc (the qf=... behavior).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis.payloads import build_payload_index
from .index.builder import InvertedIndex, build_index
from .query.scorer import BM25, Similarity, score_terms


@dataclass(frozen=True)
class FieldConfig:
    column: str                       # source column in the corpus
    similarity: Similarity = BM25     # per-field k1/b or variant
    boost: float = 1.0                # query-time field boost (qf)
    payload: bool = False             # payload-delimited field type
    tokenizer: dict = dc_field(default_factory=dict)  # analyzer kwargs


@dataclass
class Schema:
    fields: dict[str, FieldConfig]
    default_field: str


@dataclass
class Collection:
    schema: Schema
    indexes: dict[str, InvertedIndex]

    def index_for(self, field_name: str) -> InvertedIndex:
        return self.indexes[field_name]


def build_collection(docs: DataFrame, schema: Schema, doc_col: str = "doc_id") -> Collection:
    indexes: dict[str, InvertedIndex] = {}
    for name, cfg in schema.fields.items():
        if cfg.payload:
            idx = build_payload_index(docs, doc_col=doc_col, text_col=cfg.column)
        else:
            idx = build_index(
                docs, doc_col=doc_col, text_col=cfg.column, **cfg.tokenizer
            )
        indexes[name] = idx.persist()
    return Collection(schema=schema, indexes=indexes)


def collection_search(
    coll: Collection,
    terms_boosts: list[tuple[str, float]],
    k: int = 10,
    fields: list[str] | None = None,
    round_to: int = 5,
) -> DataFrame:
    """edismax qf-style search: score = sum over fields of
    field_boost * field_similarity(term, doc.field)."""
    names = fields or list(coll.schema.fields)
    partials = None
    for name in names:
        cfg = coll.schema.fields[name]
        p = score_terms(coll.indexes[name], terms_boosts, sim=cfg.similarity)
        p = p.select("doc_id", (F.col("partial") * cfg.boost).alias("partial"))
        partials = p if partials is None else partials.unionByName(p)
    scored = partials.groupBy("doc_id").agg(
        F.round(F.sum("partial"), round_to).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
