"""The sf30-wide manifest must cover the catalog EXACTLY (VERDICT r10
ask #5): every query is either in the wide sf30 sweep or carries a
written exclusion reason — a new catalog row fails here until someone
makes the conscious include-or-exclude decision."""

from __future__ import annotations


def test_manifest_covers_catalog_exactly_and_disjointly():
    from mapreducewordoccurences_spark.queries import QUERIES
    from tools.sf30_manifest import EXCLUDED, WIDE

    catalog = set(QUERIES)
    overlap = WIDE & set(EXCLUDED)
    assert not overlap, f"rows both wide and excluded: {sorted(overlap)}"
    unclassified = catalog - WIDE - set(EXCLUDED)
    assert not unclassified, (
        "catalog rows with no sf30 decision (add to tools/sf30_manifest.py "
        f"WIDE or EXCLUDED with a reason): {sorted(unclassified)}"
    )
    stale = (WIDE | set(EXCLUDED)) - catalog
    assert not stale, f"manifest names not in the catalog: {sorted(stale)}"


def test_every_exclusion_reason_is_substantive():
    from tools.sf30_manifest import EXCLUDED

    for name, reason in EXCLUDED.items():
        assert isinstance(reason, str) and len(reason) >= 40, (
            f"{name}: exclusion reason must be a real sentence, got "
            f"{reason!r}"
        )
