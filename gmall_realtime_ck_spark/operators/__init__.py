"""Batch operators.

Modules:
- ``relational`` — projections/filters (P1-P9), joins (J1-J7 analogues),
  windowed + serving aggregations (A1-A7), stream-split fanout (X1/X2),
  each re-expressed on the driver's test tables.
- ``stateful``   — batch oracles for the reference's keyed-state
  operators T1-T7 (dedup, daily-UV, returning users, visitor repair),
  written with window functions.
- ``text``       — tokenizer (the ik_analyze UDTF analogue), language
  ID, quality scoring, token counting, fingerprinting.
- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding near-dup deduplication.
- ``similarity`` — cosine top-k ANN (brute-force baseline + IVF path).
- ``multimodal`` — binary-column plumbing for image/audio payloads.
"""
