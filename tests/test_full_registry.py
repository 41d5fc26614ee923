"""Full-registry correctness gate.

The round driver samples a 50-query prefix of the registry; every other
registered query is only as good as local checks. This test runs EVERY
``queries()`` entry against its DuckDB oracle at sf0.001 (the smallest
fixture — seconds per family, minutes total) so an oracle regression in a
non-sampled query cannot ship silently (VERDICT r02, next-round #3).

Deselect for quick iteration: ``pytest -m "not full_registry"``.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _check_queries_mod():
    spec = importlib.util.spec_from_file_location(
        "check_queries", os.path.join(_REPO, "tools", "check_queries.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.full_registry
def test_every_registered_query_matches_its_oracle(spark):
    cq = _check_queries_mod()
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 213, "registry shrank — queries lost their registration"
    con = cq.duck_con(SF_DIR)
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001 — collect every failure
            failures.append(f"{name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            continue  # rows-only contract: executing without error is the check
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: oracle error: {str(e)[:200]}")
            continue
        err = cq.frames_match(sdf, odf)
        if err:
            failures.append(f"{name}: {err}")
    assert not failures, "\n".join(failures)
