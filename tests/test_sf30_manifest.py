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


def test_every_family_keeps_an_sf30_representative():
    """VERDICT r11 ask #4: the manifest covers every ROW, but nothing
    asserted every query FAMILY (the queries/ module a row registers
    in) keeps at least one representative under a scale gate. A new
    family landing with only exclusions fails here until it gets
    either a WIDE row (cross-engine at sf30) or a row explicitly
    gated at sf10/sf30 against the pure-Python reference oracle."""
    from mapreducewordoccurences_spark.queries import QUERIES
    from tools.sf30_manifest import EXCLUDED, WIDE

    families: dict[str, dict[str, int]] = {}
    for name, fn in QUERIES.items():
        fam = fn.__module__.rsplit(".", 1)[-1]
        slot = families.setdefault(fam, {"wide": 0, "scale_gated": 0})
        if name in WIDE:
            slot["wide"] += 1
        elif "sf10_acceptance" in EXCLUDED.get(name, ""):
            slot["scale_gated"] += 1
    unrepresented = sorted(
        fam
        for fam, c in families.items()
        if c["wide"] == 0 and c["scale_gated"] == 0
    )
    assert not unrepresented, (
        "query families with NO sf30-scale representative (add one row "
        "to tools/sf30_manifest.py WIDE, or gate one via "
        f"tools/sf10_acceptance.py): {unrepresented}"
    )


def test_wide_sibling_citations_resolve():
    """Exclusion reasons that delegate coverage to 'wide sibling X'
    must cite rows that are actually IN the wide set — a citation to
    a demoted or renamed sibling is silent coverage loss."""
    import re

    from mapreducewordoccurences_spark.queries import QUERIES
    from tools.sf30_manifest import EXCLUDED, WIDE

    # prose group citations → the WIDE prefix family they point at
    groups = {
        "embedding rows": "embedding_",
        "TPC-H set": "q1_",
    }
    for name, reason in EXCLUDED.items():
        m = re.search(r"wide sibling ([a-z0-9_ +]+)", reason)
        if not m:
            continue
        cited = [
            t for t in re.findall(r"[a-z0-9_]+", m.group(1)) if t in QUERIES
        ]
        if not cited:
            grp = next((p for g, p in groups.items() if g in reason), None)
            assert grp is not None, (
                f"{name}: 'wide sibling' cites neither a catalog row nor "
                "a known group phrase"
            )
            assert any(w.startswith(grp) for w in WIDE), (
                f"{name}: cited group {grp}* has no row left in WIDE"
            )
            continue
        missing = [c for c in cited if c not in WIDE]
        assert not missing, (
            f"{name}: cited siblings not in WIDE: {missing}"
        )
