"""coies_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, idiomatic-Spark rebuild of the capabilities of
ling60/coies (context-based one-shot information extraction): given a
single tagged example conversation, detect entity mentions in large
corpora of multi-turn transcripts via embedding similarity of context
windows, link + canonicalize entities, and materialize (subj, pred,
obj) triple tables.

Layout
------
core/       pure-Python/numpy reference semantics (shared by the
            single-node oracle and the Arrow-vectorized Spark kernels)
data/       deterministic synthetic transcripts + fixtures
functions/  scalar/column function builders (tokenize, cosine, hashing)
operators/  reusable DataFrame operators (windows, top_group, topk,
            dedup, ann, text analysis)
pipeline/   the KG-construction pipeline stages (detect, link,
            canonicalize, triples) + checkpoint orchestration
sources/    bucketed transcript storage (conv_id-clustered tables →
            shuffle-free assembly)
streaming/  Structured Streaming variants (windowed event rollups)
"""

__version__ = "0.1.0"
