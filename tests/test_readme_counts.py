"""README pinned-number guard (VERDICT r3 next-round #7): the Status
section pins the declared-query and oracled-query counts; this test
re-derives both from the registry so the README can never silently
drift from the code again (r3 shipped "707 tests" against a 710-test
suite and "180 declared" against a changing registry)."""

from __future__ import annotations

import os
import re

from gmall_realtime_ck_spark import registry

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def test_readme_counts_match_registry():
    text = open(README).read()
    declared = registry.all_query_names()
    oracled = [n for n in declared if n in registry.ORACLES]

    m = re.search(r"\*\*(\d+) declared queries\*\*", text)
    assert m, "README Status must pin the declared-query count"
    assert int(m.group(1)) == len(declared), (
        f"README says {m.group(1)} declared queries, registry has {len(declared)}"
    )

    m = re.search(r"\*\*(\d+) with\s+DuckDB oracles\*\*", text)
    assert m, "README Status must pin the oracled-query count"
    assert int(m.group(1)) == len(oracled), (
        f"README says {m.group(1)} oracled queries, registry has {len(oracled)}"
    )

    # no stale exact test-count pins — the suite count changes every
    # round; the README must not hard-code it
    assert not re.search(r"\*\*\d+ tests\*\*", text), (
        "README pins an exact test count — keep it unpinned"
    )
