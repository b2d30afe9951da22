"""The driver-shaped result canonicalizer — ONE implementation.

The driver's correctness sweep canonicalizes query results through
pandas (sort columns by name, factorize, hash) and hard-fails on
list/struct/map/binary cells. Both local replicas of that comparison —
the sf0.001 pytest gate (tests/test_correctness.py) and the sf0.01
vanilla-session sweep (tools/preflight.py) — MUST agree with each other
on what is green, or they recreate the round-3
`corpus_inverted_index` incident (local gate green, driver red) between
themselves. They therefore share this module instead of each keeping a
hand-maintained copy.
"""

from __future__ import annotations

#: cell types the driver canonicalizer cannot hash — includes bytes:
#: binary columns factorize nondeterministically and the oracle schema
#: lint (tests/test_oracle_schema.py) forbids them anyway
NON_SCALAR = (list, tuple, dict, set, bytes, bytearray)


def canonicalize(rows: list[tuple], columns: list[str]) -> tuple[list[str], list[tuple]]:
    """Columns sorted by name, scalar cells only (raises TypeError on a
    non-scalar), floats rounded to 9 decimals, rows sorted None-aware —
    the order-insensitive form both local gates compare on."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, NON_SCALAR) or type(v).__name__ == "Row":
                raise TypeError(
                    f"non-scalar value in column {columns[i]!r}: {type(v).__name__} — "
                    "the driver canonicalizer cannot hash list/struct/map/binary "
                    "cells; stringify (array_join / to_json / hex) in BOTH engines"
                )
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    # The cell key carries a type discriminator: `str()` collides across
    # types (int 0 vs str '0'), and a collision would let Python's stable
    # sort preserve INPUT order — two permutations of the same result
    # would then canonicalize differently (round-11 verdict "what's
    # wrong" #1). Real engine results are uniformly typed per column, so
    # the discriminator never reorders a cross-engine comparison; it only
    # pins a deterministic order for mixed-type test fixtures.
    out.sort(key=lambda r: tuple((x is None, str(x), type(x).__name__) for x in r))
    return [columns[i] for i in order], out
