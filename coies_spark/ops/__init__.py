"""Training-data-pipeline operators (documents/embeddings tables).

Everything here is expressed with built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen-friendly); no per-row Python UDFs.  Ops
that are SQL-expressible have DuckDB oracle twins in
``__spark_entry__.py``.
"""
