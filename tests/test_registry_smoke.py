"""Full-materialization smoke over every queries() entry at sf0.001.

The oracle gate (tests/test_queries_oracle.py) fully materializes every
oracle-backed query via ``toPandas()``, but rows-only queries are checked
with ``df.count()`` — and count() lets Catalyst prune projections, so a
pandas-UDF / mapInPandas closure feeding an output column can go entirely
unexecuted (the round-8 ``cosine_topk_ivf`` NameError escaped 500+ tests
this way; VERDICT r8 item 4).  This module closes that gap: every
registered query is executed to COMPLETE materialization at the smallest
scale factor, so any executor-side import/closure error surfaces.

Oracle-backed queries are smoked here too (at sf0.001, vs the gate's
configurable SF_DIR) because this module doubles as the fast
post-refactor gate: ``pytest tests/test_registry_smoke.py -q`` runs in
minutes, vs ~17 for the full suite.
"""

import pytest

import __spark_entry__ as entrymod

SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_materializes(spark, name):
    df = entrymod.queries()[name](spark, SMOKE_SF_DIR)
    pdf = df.toPandas()  # full materialization — executes every closure
    assert len(pdf.columns) > 0
    assert len(pdf) >= 0
