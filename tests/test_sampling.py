"""Unit/property tests for corpus-assembly operators
(datapipe/sampling.py, datapipe/clusters.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pedsnetdcc_spark.datapipe.clusters import assign_clusters, connected_components
from pedsnetdcc_spark.datapipe.sampling import (
    global_shuffle,
    hash_bucket,
    mix_corpora,
    pack_sequences,
    sample_fraction,
    stratified_sample,
    train_val_test_split,
)
from pedsnetdcc_spark.sources.io import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_sample_fraction_nested_and_deterministic(spark, sf_dir):
    """10% ⊆ 20% at the same seed, and reruns are identical."""
    docs = _docs(spark, sf_dir)
    s10 = {r.doc_id for r in sample_fraction(docs, "doc_id", 10).collect()}
    s20 = {r.doc_id for r in sample_fraction(docs, "doc_id", 20).collect()}
    again = {r.doc_id for r in sample_fraction(docs, "doc_id", 10).collect()}
    assert s10 <= s20
    assert s10 == again
    assert len(s20) > len(s10) > 0


def test_split_partitions_whole_corpus(spark, sf_dir):
    """Splits are exhaustive and disjoint; production xxhash64 family
    obeys the same partition property as the portable one."""
    docs = _docs(spark, sf_dir)
    for family in ("portable", "xxhash64"):
        out = train_val_test_split(
            docs, "doc_id", val_pct=15, test_pct=5, hash_family=family
        )
        counts = dict(
            out.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
        )
        assert sum(counts.values()) == docs.count()
        assert set(counts) == {"train", "val", "test"}


def test_stratified_sample_is_per_stratum_fraction(spark, sf_dir):
    """Stratified output == per-stratum application of sample_fraction."""
    docs = _docs(spark, sf_dir)
    rates = {"en": 100, "de": 50, "zh": 0}
    out = stratified_sample(docs, "doc_id", "lang", rates, default_pct=10)
    got = {r.doc_id for r in out.collect()}
    expect = set()
    for lang in [r.lang for r in docs.select("lang").distinct().collect()]:
        sub = docs.where(F.col("lang") == lang)
        expect |= {
            r.doc_id
            for r in sample_fraction(sub, "doc_id", rates.get(lang, 10)).collect()
        }
    assert got == expect
    assert not {r.doc_id for r in out.where(F.col("lang") == "zh").collect()}


def test_mix_corpora_tags_and_respects_weights(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    groups = {
        "a": (docs.where(F.col("doc_id") % 2 == 0), 100),
        "b": (docs.where(F.col("doc_id") % 2 == 1), 0),
    }
    out = mix_corpora(groups, "doc_id")
    tags = {r.mix_source for r in out.select("mix_source").distinct().collect()}
    assert tags == {"a"}  # weight-0 source contributes nothing
    assert out.count() == docs.where(F.col("doc_id") % 2 == 0).count()


def test_pack_sequences_layout_invariants(spark, sf_dir):
    """Offsets stay inside the budget; within a shard, (bin, offset)
    is the running token layout in id order."""
    budget = 64
    docs = _docs(spark, sf_dir).withColumn(
        "ntok", F.size(F.split(F.col("text"), " "))
    )
    out = pack_sequences(docs, "doc_id", "ntok", budget=budget, shards=4)
    rows = (
        out.join(docs.select("doc_id", "ntok"), "doc_id")
        .orderBy("shard", "doc_id")
        .collect()
    )
    assert rows
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        cum = 0
        for r in shard_rows:
            assert 0 <= r.bin_offset < budget
            assert r.bin == cum // budget
            assert r.bin_offset == cum - r.bin * budget
            cum += r.ntok


def test_global_shuffle_modes_agree_and_permute(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    dist = {
        r.doc_id: r.shuffle_pos
        for r in global_shuffle(docs, "doc_id", mode="distributed").collect()
    }
    win = {
        r.doc_id: r.shuffle_pos
        for r in global_shuffle(docs, "doc_id", mode="window").collect()
    }
    assert dist == win
    n = docs.count()
    assert sorted(dist.values()) == list(range(1, n + 1))
    # a different seed is a different permutation
    other = {
        r.doc_id: r.shuffle_pos
        for r in global_shuffle(docs, "doc_id", seed=1, mode="distributed").collect()
    }
    assert other != dist


def test_global_shuffle_rank_is_partitioning_invariant(spark, sf_dir):
    """The distributed prefix-sum rank must be a pure function of the
    data, not of the incoming partition layout — retries, different
    cluster sizes, and upstream repartitions all deliver the identical
    epoch permutation."""
    docs = _docs(spark, sf_dir)
    a = {
        r.doc_id: r.shuffle_pos
        for r in global_shuffle(docs.repartition(2), "doc_id").collect()
    }
    b = {
        r.doc_id: r.shuffle_pos
        for r in global_shuffle(docs.repartition(32), "doc_id").collect()
    }
    assert a == b


def test_pack_sequences_hot_shard_and_partition_invariance(spark):
    """Skew shape: nearly every row lands in ONE shard (plus one
    pathologically long document).  The layout must still satisfy the
    running-offset invariants, match an independent Python computation,
    and be identical whichever way the input was partitioned."""
    import hashlib

    from pedsnetdcc_spark.datapipe.sampling import hash_bucket

    def py_bucket(doc_id: int, seed: int, buckets: int) -> int:
        return int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16) % buckets

    base = spark.range(4000).select(F.col("id").alias("doc_id"))
    tagged = base.withColumn("bucket", hash_bucket(F.col("doc_id"), 0, 4))
    # the hot shard: every bucket-0 id; a thin sprinkle of the others
    docs = (
        tagged.where((F.col("bucket") == 0) | (F.col("doc_id") % 200 == 0))
        .drop("bucket")
        .withColumn(
            "ntok",
            F.when(F.col("doc_id") == 0, F.lit(100_000)).otherwise(
                F.col("doc_id") % 37 + 1
            ),
        )
    )
    budget = 128
    out2 = sorted(
        map(tuple, pack_sequences(docs.repartition(2), "doc_id", "ntok", budget, shards=4).collect())
    )
    out32 = sorted(
        map(tuple, pack_sequences(docs.repartition(32), "doc_id", "ntok", budget, shards=4).collect())
    )
    assert out2 == out32
    # independent Python layout
    rows = sorted((r.doc_id, r.ntok) for r in docs.collect())
    shard_rows = {s: [(d, n) for d, n in rows if py_bucket(d, 0, 4) == s] for s in range(4)}
    assert len(shard_rows[0]) > 0.8 * len(rows)  # the shard really is hot
    expected = []
    for s, srows in shard_rows.items():
        cum = 0
        for d, n in srows:
            expected.append((d, s, cum // budget, cum % budget))
            cum += n
    assert sorted(expected) == out2


def test_mix_corpora_seeds_stable_under_source_set_changes(spark, sf_dir):
    """Adding a source must not resample any existing source: per-source
    seeds derive from the source NAME, not its position in the sorted
    set."""
    docs = _docs(spark, sf_dir)
    two = mix_corpora({"a": (docs, 50), "c": (docs, 50)}, "doc_id")
    three = mix_corpora({"a": (docs, 50), "b": (docs, 30), "c": (docs, 50)}, "doc_id")

    def members(out, tag):
        return {r.doc_id for r in out.where(F.col("mix_source") == tag).collect()}

    assert members(two, "a") == members(three, "a")
    assert members(two, "c") == members(three, "c")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_connected_components_two_components(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_chain_converges(spark):
    """A 12-node path graph — worst case for plain propagation — still
    converges within the default round budget."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 12)])
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {1}
    assert len(comp) == 12


def test_assign_clusters_labels_singletons_with_own_id(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = _pairs(spark, [(2, 4), (4, 6)])
    out = {r.doc_id: r.cluster_id for r in assign_clusters(df, "doc_id", pairs).collect()}
    assert out == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5, 6: 2}


def test_hash_bucket_families_bounded(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    for family in ("portable", "xxhash64"):
        mm = docs.select(
            F.min(hash_bucket(F.col("doc_id"), 0, 100, family)).alias("lo"),
            F.max(hash_bucket(F.col("doc_id"), 0, 100, family)).alias("hi"),
        ).collect()[0]
        assert 0 <= mm.lo and mm.hi <= 99


def test_chunk_documents_covers_all_tokens_with_overlap(spark, sf_dir):
    from pedsnetdcc_spark.datapipe.text import chunk_documents

    docs = _docs(spark, sf_dir).limit(50)
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=16, overlap=4)
    rows = out.orderBy("doc_id", "chunk_id").collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chunks in by_doc.items():
        toks = texts[doc_id].split(" ")
        rebuilt: list[str] = []
        for i, r in enumerate(chunks):
            ctoks = r.chunk_text.split(" ") if r.chunk_text else [""]
            assert r.chunk_id == i
            assert r.n_chunk_tokens == len(ctoks) <= 16
            start = i * 12
            assert ctoks == toks[start : start + 16]
            rebuilt.extend(ctoks if i == 0 else ctoks[4:])
        # overlap-aware reassembly reproduces the document exactly
        assert rebuilt == toks


def test_normalize_text_idempotent(spark, sf_dir):
    from pedsnetdcc_spark.datapipe.text import normalize_text

    docs = _docs(spark, sf_dir).limit(50)
    once = normalize_text(docs, "text")
    twice = normalize_text(once.select(F.col("doc_id"), F.col("norm_text").alias("text")), "text")
    a = {r.doc_id: r.norm_text for r in once.collect()}
    b = {r.doc_id: r.norm_text for r in twice.collect()}
    assert a == b


def test_normalize_unicode_forms(spark):
    """NFC merges combining marks into composed forms (é both ways
    hash-equal after), NFKC folds compatibility variants (ﬁ ligature,
    full-width digits); results match python's unicodedata exactly and
    composed exact-dedup catches the homoglyph duplicate only after
    normalization."""
    import unicodedata

    from pedsnetdcc_spark.datapipe.dedup import exact_dedup_groups
    from pedsnetdcc_spark.datapipe.text import normalize_unicode

    composed = "café ﬁne １２"      # é, ﬁ, full-width 12
    combining = "café ﬁne １２"    # e + U+0301
    docs = spark.createDataFrame(
        [(1, composed), (2, combining)], "doc_id long, text string"
    )
    nfc = {r["doc_id"]: r["nfc_text"]
           for r in normalize_unicode(docs, form="NFC").collect()}
    assert nfc[1] == nfc[2] == unicodedata.normalize("NFC", composed)
    nfkc = {r["doc_id"]: r["out"]
            for r in normalize_unicode(docs, out_col="out", form="NFKC").collect()}
    assert nfkc[1] == unicodedata.normalize("NFKC", composed)
    assert "fine" in nfkc[1] and "12" in nfkc[1]  # ligature + digits folded
    # composition: exact dedup sees ONE distinct content only after NFC
    raw_groups = exact_dedup_groups(docs, "doc_id", "text").count()
    norm_groups = exact_dedup_groups(
        normalize_unicode(docs), "doc_id", "nfc_text"
    ).count()
    assert raw_groups == 2 and norm_groups == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_unicode(docs, form="NFX")


def test_sample_per_group_exact_sizes_and_determinism(spark, sf_dir):
    from pedsnetdcc_spark.datapipe.sampling import sample_per_group

    docs = _docs(spark, sf_dir)
    out = sample_per_group(docs, "doc_id", "lang", n_per_group=5)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    full = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert n == min(5, full[lang])
    again = sample_per_group(docs, "doc_id", "lang", n_per_group=5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_profile_table_approx_mode_within_tolerance(spark, sf_dir):
    """HLL profile (the 100 TB mode) tracks the exact profile within
    the configured relative error on every column."""
    from pedsnetdcc_spark.operators.profile import profile_table

    docs = _docs(spark, sf_dir)
    exact = {r["column"]: r for r in profile_table(docs).collect()}
    approx = {
        r["column"]: r
        for r in profile_table(docs, approx_distinct=True, rsd=0.05).collect()
    }
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert (a["n_rows"], a["n_null"]) == (e["n_rows"], e["n_null"])
        if e["n_distinct"]:
            rel = abs(a["n_distinct"] - e["n_distinct"]) / e["n_distinct"]
            assert rel <= 0.15, (c, e["n_distinct"], a["n_distinct"])


def test_temperature_sample_reweights_head_vs_tail(spark):
    from pedsnetdcc_spark.datapipe.sampling import temperature_sample

    rows = [(i, "A") for i in range(900)] + [(900 + i, "B") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_sample(df, "doc_id", "source", alpha=0.5, budget_frac=0.5)
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # rates: w_A=30, w_B=10, z=40, N=1000 → rate_A=min(1, 500·0.75/900)≈0.4167,
    # rate_B=min(1, 500·0.25/100)=1.0 — the tail source is kept WHOLE
    assert counts["B"] == 100
    assert 300 <= counts["A"] <= 450          # hash-uniform around 375
    # deterministic: same seed → identical membership
    again = temperature_sample(df, "doc_id", "source", alpha=0.5, budget_frac=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # a different seed resamples the down-sampled source
    other = temperature_sample(
        df, "doc_id", "source", alpha=0.5, budget_frac=0.5, seed=7
    )
    assert sorted(r["doc_id"] for r in out.collect()) != sorted(
        r["doc_id"] for r in other.collect()
    )
