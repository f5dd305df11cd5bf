"""solrplugins_spark — a PySpark-native full-text analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of DiceTechJobs/SolrPlugins (a Solr/Lucene 6.x plugin
suite) as idiomatic PySpark: DataFrame/SQL logical plans optimized by
Catalyst, Arrow-vectorized pandas UDFs only where built-in operators
cannot express the semantics (posting-list codecs, block-max WAND).

Layout
------
- ``analysis``   tokenizer + token-filter chain (reference: tokenfilters/)
- ``index``      inverted-index build: postings, terms, doclen, segments
- ``query``      parser/AST, BM25 scorer, top-k, MLT, feedback
- ``functions``  function queries (termfreq, termintersect, fieldlen, ...)
- ``analytics``  joint counts, naive bayes, decision stumps
- ``suggest``    suggesters + spellcheck
- ``dedup``      exact / minhash-LSH / simhash / ngram-jaccard dedup
- ``similarity`` embedding ANN (brute-force + LSH-bucketed cosine top-k)
- ``text``       language-id, quality scoring, token counts, fingerprints
- ``multimodal`` binary-column plumbing for image/audio payloads
"""

__version__ = "0.1.0"
