"""Storage contract for iterative pipeline ops — zz-prefixed so it runs
AFTER the reference-suite replay batch has joined (tests/conftest.py
pytest_runtestloop): the assertions diff the CONTEXT-GLOBAL RDD storage
set, which must not race the replay's concurrent write-snapshot
checkpoints."""


def test_near_dedup_releases_caches(spark):
    """Storage contract (VERDICT r2 #9): after near_dedup returns, exactly
    ONE set of checkpoint blocks stays pinned — the component labels the
    result plan reads from (an iterative result has no lineage left to
    recompute). Superseded WCC iterations and the signature/pair caches are
    released inside the call, and release_plan_checkpoints(result) frees
    the rest, so a long-lived session accumulates nothing."""
    from age_spark.pipeline.dedup import minhash_dedup_pairs, near_dedup
    from age_spark.runtime.cache import release_plan_checkpoints

    docs = spark.createDataFrame(
        [(i, f"doc number {i} with shared filler words common to all") for i in range(30)],
        "doc_id long, text string",
    )
    sc = spark.sparkContext
    before = {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}
    res = near_dedup(docs, threshold=0.5)
    res.count()
    # default (lazy) pair op must not persist anything at all
    minhash_dedup_pairs(docs, threshold=0.5).count()
    after = {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}
    leaked = after - before
    assert len(leaked) <= 1, f"leaked cached RDDs beyond the result: {sorted(leaked)}"
    # consuming the result and releasing it leaves storage exactly as found
    released = release_plan_checkpoints(res)
    assert released >= 1
    final = {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}
    assert final <= before, f"leaked cached RDDs: {sorted(final - before)}"


def test_train_bpe_releases_checkpoints(spark):
    """train_bpe's every-64-merge symbol-column re-checkpoint (round 9)
    must release each superseded checkpoint as the loop advances and the
    final one on return — training a large vocabulary in a long-lived
    session pins nothing."""
    from age_spark.pipeline.bpe import train_bpe

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}xyzq" for i in range(120)) * 2)],
        "doc_id long, text string",
    )
    sc = spark.sparkContext
    before = {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}
    merges = train_bpe(docs, n_merges=80)  # crosses the 64-merge fold
    assert len(merges) == 80
    after = {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}
    assert after <= before, f"leaked checkpoints: {sorted(after - before)}"

