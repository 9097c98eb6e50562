"""Pure-Python/numpy reference semantics.

These functions define the *exact* text/ranking semantics the Spark
pipeline must reproduce (parity targets cited to /root/reference as
file:line in each docstring).  They are deliberately dependency-free so
both the single-node oracle (tests/oracle) and the Arrow-vectorized
Spark kernels import the same definitions — parity by construction.
"""
