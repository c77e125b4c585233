"""DuckDB-oracle parity for every registered query (driver-gate replica)."""

from __future__ import annotations

import pytest

from rag_vector_database_spark.plans.registry import REGISTRY

from .oracle import compare


@pytest.mark.parametrize("qdef", [q for q in REGISTRY if q.oracle],
                         ids=[q.name for q in REGISTRY if q.oracle])
def test_oracle_parity(spark, sf_dir, qdef):
    df = qdef.builder(spark, sf_dir)
    ok, msg = compare(df, qdef.oracle, sf_dir)
    assert ok, f"{qdef.name}: {msg}"


_NO_ORACLE = [q for q in REGISTRY if not q.oracle]


@pytest.mark.skipif(not _NO_ORACLE, reason="all queries have oracles")
@pytest.mark.parametrize("qdef", _NO_ORACLE, ids=[q.name for q in _NO_ORACLE])
def test_rows_only(spark, sf_dir, qdef):
    df = qdef.builder(spark, sf_dir)
    assert df.count() >= 0


def test_registry_names_unique_and_wired():
    """Duplicate names would silently shadow entries in the queries()
    dict the driver consumes; every oracle must be non-empty SQL."""
    names = [q.name for q in REGISTRY]
    assert len(names) == len(set(names)), sorted(
        n for n in set(names) if names.count(n) > 1)
    for q in REGISTRY:
        if q.oracle is not None:
            assert q.oracle.strip().upper().startswith(
                ("SELECT", "WITH", "(")), q.name
    # WINDOW_PRIORITY is the graded ordering: a duplicate would make a
    # query occupy two slots (and run twice for list consumers); an
    # unknown name is a silent no-op. Both must fail loudly here.
    from rag_vector_database_spark.plans.registry import WINDOW_PRIORITY
    wp = list(WINDOW_PRIORITY)
    assert len(wp) == len(set(wp)), sorted(
        n for n in set(wp) if wp.count(n) > 1)
    known = set(n for n in (q.name for q in REGISTRY))
    assert [n for n in wp if n not in known] == []
    # the graded 50-prefix must never contain a no-oracle entry (the
    # driver can only record err:no_oracle for those)
    from rag_vector_database_spark.plans.registry import queries
    no_oracle = {q.name for q in REGISTRY if q.oracle is None}
    assert [n for n in list(queries())[:50] if n in no_oracle] == []
