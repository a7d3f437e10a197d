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
  cartesian;
* no ``Exchange`` directly over a ``LocalTableScan`` — a literal frame
  small enough to build driver-side must BROADCAST into its join, never
  shuffle (a shuffled literal is a non-broadcast join against a
  handful of rows: pure overhead that also forces the big side through
  an exchange it didn't need);
* every ``.collect()`` in package source sits on the audited
  control-plane allowlist (VERDICT r3 "What's wrong" #3) — new
  data-plane collects fail CI until audited here.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from pathlib import Path

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
    assert not re.search(
        r"Exchange[^\n]*\n[^\n]*?[+:]-\s*\*?\s*LocalTableScan", plan
    ), (
        f"{name}: literal frame is being SHUFFLED — wrap it in "
        "F.broadcast() so the join against it broadcasts"
    )


# ---------------------------------------------------------------------------
# collect() allowlist: every driver-side read of executor data in
# package source, audited. Each entry documents WHY the read is bounded;
# a new .collect() anywhere else fails until it's audited here.
# ---------------------------------------------------------------------------
_COLLECT_ALLOWLIST: dict[str, tuple[int, str]] = {
    # file (relative to the package) -> (max sites, bound justification)
    "plans/scheduler.py": (2, "control plane: max(job_id) scalar + <=10 "
                              "ledger control rows per reference batch"),
    "extensions/bpe.py": (1, "one argmax row per merge round, bounded by "
                             "n_merges"),
    "operators/bloom.py": (1, "<= n_bits/64 bitmap words"),
    "operators/relational.py": (1, "G4 tiny-dim materialization: the "
                                   "27-row interest taxonomy"),
    "streaming/rollup.py": (1, "touched partition dates per micro-batch "
                               "(1-2 for a steady stream)"),
    "streaming/ledger.py": (1, "restart progress seed: ONE ledger row's "
                               "processed_items, read once per sink "
                               "instance (r9 resume-correct restart)"),
    "formats.py": (9, "touched bucket ids of a merge batch (one site "
                      "per TableFormat backend) + read_for_keys'/"
                      "delete_keys'/delete_keys_dv's wanted-bucket "
                      "sets (each <= num_buckets ints) + "
                      "delete_keys_dv's victim positions — one (file, "
                      "ordinal) pair per newly deleted row, the same "
                      "control-plane budget the manifest pays to "
                      "store the DV; bulk erasure is documented onto "
                      "the copy-on-write delete_keys + "
                      "_validate_constraints' ONE aggregate row (all "
                      "constraints' violation counts in one pass) + "
                      "replace_where's matching/incoming bucket-id "
                      "sets (each <= num_buckets ints)"),
    "extensions/export.py": (1, "shard manifest: one summary row per "
                                "shard, <= n_shards"),
    "extensions/unigram.py": (2, "vocab table <= seed_size/vocab_size "
                                 "rows per EM round — the model "
                                 "parameters, k-means-centroid analog"),
    "extensions/pca.py": (4, "PCA model reads: 1-row dim probe, d^2 "
                             "Gram cells, d vector sums, scalar n — "
                             "O(d^2) model parameters, never vectors"),
    "extensions/classifier.py": (3, "logit model reads: 1-row dim "
                                    "probe + d gradient cells + 3 "
                                    "scalars per GD round — O(d) model "
                                    "parameters"),
    "sources/warc.py": (1, "write manifest: one summary row per "
                           "archive file, <= files"),
    "queries/ledger.py": (2, "txlog_restore_sql's DESCRIBE HISTORY "
                             "read: one control-plane row per "
                             "committed version (<= 4 in the "
                             "fixture), used to compute the "
                             "TIMESTAMP AS OF midpoint + "
                             "txlog_replace_where_sql's 3-row "
                             "threshold probe (ORDER BY k LIMIT 3)"),
    "streaming/monitor.py": (1, "per-batch histogram read-back, "
                                "<= n_bins rows — the drift monitor's "
                                "control-plane summary"),
    "streaming/lateness.py": (1, "per-batch watermark advance: one "
                                 "1-row MAX(ts) scalar read — the "
                                 "engine's own watermark bookkeeping "
                                 "replicated for the accounting twin"),
    "testing.py": (1, "test harness oracle comparator, not a data path"),
}


def test_collect_sites_are_all_audited():
    pkg = Path(__file__).resolve().parent.parent / (
        "instagram_data_pipeline_spark"
    )
    found: dict[str, int] = {}
    for py in pkg.rglob("*.py"):
        n = py.read_text().count(".collect()")
        if n:
            found[str(py.relative_to(pkg))] = n
    unaudited = {
        f: n for f, n in found.items()
        if f not in _COLLECT_ALLOWLIST or n > _COLLECT_ALLOWLIST[f][0]
    }
    assert not unaudited, (
        f"unaudited .collect() sites {unaudited} — a driver-side collect "
        "on a data path breaks at scale; audit the bound and add it to "
        "_COLLECT_ALLOWLIST or redesign"
    )
