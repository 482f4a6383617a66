"""Sharded training-export: determinism, completeness, balance."""

from __future__ import annotations

from datanika_core_spark.operators.export import (
    assign_shard,
    export_shards,
    shard_manifest,
)
from datanika_core_spark.session import read_table

from tests.conftest import SF_SMOKE

N_SHARDS = 4


def _docs(spark):
    return read_table(spark, f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text", "source"
    )


def test_export_complete_and_balanced(spark, tmp_path):
    docs = _docs(spark)
    res = export_shards(
        docs, str(tmp_path / "corpus"), key="doc_id", n_shards=N_SHARDS
    )
    assert res.rows == docs.count()
    m = shard_manifest(spark, res.path).collect()
    assert [r.shard for r in m] == list(range(N_SHARDS))
    assert sum(r.n_docs for r in m) == res.rows
    # uniform hash: no shard more than 2x the ideal share
    ideal = res.rows / N_SHARDS
    assert all(r.n_docs < 2 * ideal for r in m)


def test_assignment_deterministic_and_partition_independent(spark):
    docs = _docs(spark)
    a = {
        (r.doc_id, r.shard, r.interleave)
        for r in assign_shard(docs, "doc_id", N_SHARDS).collect()
    }
    b = {
        (r.doc_id, r.shard, r.interleave)
        for r in assign_shard(
            docs.repartition(13), "doc_id", N_SHARDS
        ).collect()
    }
    assert a == b


def test_incremental_export_stability(spark, tmp_path):
    """New docs never move existing docs to a different shard."""
    docs = _docs(spark)
    old = assign_shard(docs.filter("doc_id < 25"), "doc_id", N_SHARDS)
    new = assign_shard(docs, "doc_id", N_SHARDS)
    old_map = {r.doc_id: r.shard for r in old.collect()}
    new_map = {r.doc_id: r.shard for r in new.collect()}
    for doc_id, shard in old_map.items():
        assert new_map[doc_id] == shard


def test_export_jsonl_shards_roundtrip(spark, tmp_path):
    import json

    from datanika_core_spark.operators.export import export_jsonl_shards
    from datanika_core_spark.session import read_table

    docs = read_table(
        spark, "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang")
    out = str(tmp_path / "jsonl_out")
    res = export_jsonl_shards(docs, out, key="doc_id", n_shards=4)
    assert res.rows == docs.count()
    assert res.n_shards == 4

    # every line parses as JSON with exactly the exported columns,
    # and the union of shards reproduces the input exactly
    back = spark.read.text(out).collect()
    objs = [json.loads(r.value) for r in back]
    assert len(objs) == res.rows
    assert all(set(o) <= {"doc_id", "text", "lang"} for o in objs)
    got = {(o["doc_id"], o["text"], o["lang"]) for o in objs}
    want = {(r.doc_id, r.text, r.lang) for r in docs.collect()}
    assert got == want

    # rerun → byte-identical shard contents (deterministic order)
    out2 = str(tmp_path / "jsonl_out2")
    export_jsonl_shards(docs, out2, key="doc_id", n_shards=4)
    for shard in range(4):
        a = sorted(
            p.read_text()
            for p in (tmp_path / "jsonl_out" / f"shard={shard}").glob(
                "*.txt"
            )
        )
        b = sorted(
            p.read_text()
            for p in (tmp_path / "jsonl_out2" / f"shard={shard}").glob(
                "*.txt"
            )
        )
        assert a == b and a
