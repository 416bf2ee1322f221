"""Staleness gate for the docs artifacts (VERDICT r6 item 3): every
registered query must appear in CATALOG.md, so a query landing without a
catalog regeneration fails the suite instead of silently misrepresenting
the surface. (`python scripts/generate_catalog.py` regenerates.)"""

from __future__ import annotations

import re
from pathlib import Path


def test_catalog_covers_every_registered_query():
    from mycarely_saas_dbt_spark.entry import build_queries

    catalog = Path(__file__).resolve().parent.parent / "CATALOG.md"
    text = catalog.read_text()
    listed = set(re.findall(r"\| `([a-z0-9_]+)` \|", text))
    missing = sorted(set(build_queries()) - listed)
    assert not missing, (
        f"CATALOG.md is stale — {len(missing)} registered queries missing: "
        f"{missing}; run `python scripts/generate_catalog.py`"
    )
    # the header count must match the registry too
    m = re.search(r"(\d+) registered queries", text)
    assert m and int(m.group(1)) == len(build_queries()), (
        f"CATALOG.md header says {m and m.group(1)} but registry has "
        f"{len(build_queries())}"
    )
