"""End-to-end corpus build at sf0.001: the full training-data chain —
quality signals → NB classifier gate → MinHash near-dup → connected
components → quality-ranked survivors → BPE token counts → token-shard
packing → shard materialization → atomic snapshot commit — run twice to
pin determinism of the FINAL artifact (shard md5s), which is what a
resumable production pipeline actually guarantees."""

import hashlib
import os

import pytest

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def built(spark):
    def build():
        from soda_core_spark.functions.bpe import bpe_token_counts, train_bpe
        from soda_core_spark.operators.dedup import (
            best_of_cluster,
            connected_components,
            minhash_near_duplicates,
        )
        from soda_core_spark.operators.nbgram import nb_quality_classifier
        from soda_core_spark.operators.sampling import (
            materialize_shards,
            pack_token_shards,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        n0 = docs.count()

        # 1. model gate: keep docs the NB classifier scores as en-like
        labeled = docs.withColumn("label", F.col("lang") == "en")
        scored = nb_quality_classifier(labeled, buckets=512)
        kept = docs.join(
            scored.where(F.col("nb_pred")).select("doc_id"), "doc_id"
        )
        n1 = kept.count()
        assert 0 < n1 < n0

        # 2. near-dup dedup, best-quality survivor per cluster
        pairs = minhash_near_duplicates(
            kept, num_hashes=16, bands=8, jaccard_threshold=0.5
        ).select(
            F.col("id_a").alias("id_a"), F.col("id_b").alias("id_b")
        )
        comps = connected_components(pairs)
        deduped = best_of_cluster(
            kept, comps, F.length(F.coalesce(F.col("text"), F.lit("")))
        )
        n2 = deduped.count()
        assert 0 < n2 <= n1

        # 3. tokenizer-accurate counts and fixed-budget shards
        merges = train_bpe(deduped, num_merges=60)
        counts = bpe_token_counts(deduped, merges).withColumnRenamed(
            "bpe_tokens", "n_tokens"
        )
        staged = deduped.join(counts, "doc_id")
        packed = pack_token_shards(staged, shard_tokens=2000)
        shards = materialize_shards(packed)
        rows = shards.orderBy("shard").collect()
        assert rows and sum(r["n_docs"] for r in rows) == n2

        # 4. atomic publication
        from soda_core_spark.sources.snapshots import SnapshotTable

        import tempfile

        tdir = tempfile.mkdtemp(prefix="corpus_")
        t = SnapshotTable(spark, tdir)
        sid = t.append(shards.select("shard", "n_docs", "shard_text"))
        assert t.read(sid).count() == len(rows)

        digest = [
            (r["shard"], hashlib.md5(r["shard_text"].encode()).hexdigest())
            for r in rows
        ]
        return n0, n1, n2, digest

    return build


def test_chain_is_deterministic_end_to_end(built):
    a = built()
    b = built()
    assert a == b  # identical shard md5s across full re-runs


def test_chain_shrinks_monotonically(built):
    n0, n1, n2, digest = built()
    assert n0 >= n1 >= n2 > 0
    assert len({s for _, s in digest}) == len(digest)  # shards distinct
