"""LLM-pipeline operator tests (dedup / similarity / text analysis).

Value-level parity with DuckDB is covered by tools/check_oracle.py; these
tests pin structural invariants at sf0.001 so regressions surface in the
fast suite.
"""

from __future__ import annotations

from queue_system_simulator_spark.plans import QUERIES


def test_simhash_signature_shape(spark, sf_dir):
    rows = QUERIES["simhash_signatures"].build(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert len(r.simhash) == 64
        assert set(r.simhash) <= {"0", "1"}


def test_simhash_pairs_invariants(spark, sf_dir):
    rows = QUERIES["simhash_near_dup_pairs"].build(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.doc_a < r.doc_b  # ordered, no self-pairs
        assert 0 <= r.hamming <= 8
        seen.add((r.doc_a, r.doc_b))
    assert len(seen) == len(rows)  # no duplicate pairs


def test_minhash_long_format_matches_wide(spark, sf_dir):
    sig = QUERIES["minhash_signatures"].build(spark, sf_dir)
    n_docs = sig.select("doc_id").distinct().count()
    assert sig.count() == n_docs * 16  # every doc has all 16 seeds


def test_dedup_exact_partitions_corpus(spark, sf_dir):
    from queue_system_simulator_spark.schema import load_table

    dedup = QUERIES["dedup_exact"].build(spark, sf_dir)
    total_docs = load_table(spark, sf_dir, "documents").count()
    agg = dedup.groupBy().sum("n_copies").collect()[0][0]
    assert agg == total_docs  # every document lands in exactly one group


def test_dedup_clusters_partition_and_canonicals(spark, sf_dir):
    rows = QUERIES["dedup_clusters"].build(spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        assert r.cluster_id <= r.doc_id  # label = component minimum
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert len(members) == members[0].cluster_size
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1 and canon[0].doc_id == cid
