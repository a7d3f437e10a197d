"""Plan-shape invariants over the whole registry: the plan-audit doc
(PLANS_r*.md) as enforced CI checks, not just evidence.

Building a plan is cheap (no execution), so every non-streaming registry
query gets its physical plan string checked:

* no ``BatchEvalPython`` — row-at-a-time Python UDFs are banned in the
  hot path; Python may only touch data through Arrow
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``)
  at the documented model/binary/simhash boundaries;
* no ``CartesianProduct`` — the only sanctioned cross joins are
  broadcast 1-row dims (BroadcastNestedLoopJoin), never a shuffled
  cartesian.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from instagram_data_pipeline_spark.queries import load_all

REGISTRY = load_all()

# streaming queries execute inside spark_fn (availableNow drain) — their
# batch twins cover the plan shape; building them here would run them
_SKIP = {
    name
    for name, spec in REGISTRY.items()
    if "streaming" in spec.tags
}


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if n not in _SKIP)
)
def test_no_plan_antipatterns(name, spark, sf_dir):
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan"
    )
    assert "CartesianProduct" not in plan, (
        f"{name}: shuffled cartesian product in the plan"
    )
