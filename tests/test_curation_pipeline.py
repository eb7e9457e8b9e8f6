"""End-to-end curation pipeline example (examples/curation_pipeline.py):
the composed operator chain must run at sf0.001, shrink monotonically
through the funnel, and write readable train shards. (Chain
determinism follows from the per-operator determinism property tests —
hash_split, Gumbel-top-k, stratified_cap, dedup — so this test runs
the ~3-minute pipeline once, not twice.)"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from examples.curation_pipeline import run_curation_pipeline  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_pipeline_funnel(spark, tmp_path):
    r1 = run_curation_pipeline(spark, SF, str(tmp_path / "a"))
    f = r1["funnel"]
    # monotone funnel: every stage can only remove documents
    order = ["raw", "quality", "exact_dedup", "near_dedup",
             "decontaminated", "selected"]
    for prev, cur in zip(order, order[1:]):
        assert f[cur] <= f[prev], (prev, cur, f)
    assert f["selected"] > 0
    # train shards exist and carry the expected columns
    train = spark.read.parquet(r1["train_path"])
    assert {"doc_id", "text", "split", "tokens", "shard"} <= \
        set(train.columns)
    assert train.filter("split <> 'train'").count() == 0
    # the persisted signature index is a readable standalone artifact
    idx = spark.read.parquet(r1["index_path"])
    assert {"doc", "sig", "sz"} <= set(idx.columns)
    assert idx.count() == f["exact_dedup"]
