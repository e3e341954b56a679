"""Extraction front end: interleaved docs -> (s, p, o) triples.

New-build stage (the reference starts from already-extracted triples,
reference get_triples/process_triples.py:12-13); constrained by the
reference's *output* contract — flat string triples — and the graft's
input contract (interleaved text+media spans, vectorized UDFs only).
"""

from ttmf_spark.extract.pipeline import extract_triples  # noqa: F401
