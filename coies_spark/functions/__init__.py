"""Column-level function builders (JVM-side first, pandas UDF fallback)."""
