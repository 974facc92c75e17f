"""Deterministic hash sampling: reproducibility, partition invariance,
monotone growth, stratified rates, split stability (SURVEY.md §5 model —
property tests over the driver fixtures)."""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators import sampling


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


class TestHashSample:
    def test_deterministic_and_partition_invariant(self, documents):
        a = _ids(sampling.hash_sample(documents, 0.3, key_col="doc_id"))
        b = _ids(sampling.hash_sample(documents.repartition(13), 0.3,
                                      key_col="doc_id"))
        assert a == b and a  # same set regardless of partitioning

    def test_monotone_in_fraction(self, documents):
        small = _ids(sampling.hash_sample(documents, 0.2, key_col="doc_id"))
        big = _ids(sampling.hash_sample(documents, 0.4, key_col="doc_id"))
        assert small < big  # strict superset at these sizes

    def test_seed_changes_the_draw(self, documents):
        a = _ids(sampling.hash_sample(documents, 0.3, key_col="doc_id", seed=1))
        b = _ids(sampling.hash_sample(documents, 0.3, key_col="doc_id", seed=2))
        assert a != b

    def test_realized_fraction_near_nominal(self, documents):
        n = documents.count()
        k = sampling.hash_sample(documents, 0.5, key_col="doc_id").count()
        assert abs(k / n - 0.5) < 0.15  # binomial tolerance at fixture size

    def test_edge_fractions(self, documents):
        assert sampling.hash_sample(documents, 0.0, key_col="doc_id").count() == 0
        assert sampling.hash_sample(documents, 1.0, key_col="doc_id").count() \
            == documents.count()

    def test_bad_fraction_raises(self, documents):
        with pytest.raises(ValueError, match="fraction"):
            sampling.hash_sample(documents, 1.5, key_col="doc_id")

    def test_no_shuffle_in_plan(self, documents):
        res = sampling.hash_sample(documents, 0.3, key_col="doc_id")
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestStratified:
    def test_rates_differ_by_stratum(self, documents):
        res = sampling.stratified_hash_sample(
            documents, {"en": 0.9, "de": 0.1}, stratum_col="lang",
            key_col="doc_id", default_fraction=0.0)
        by_lang = {r["lang"]: r["n"] for r in
                   res.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        totals = {r["lang"]: r["n"] for r in
                  documents.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert set(by_lang) <= {"en", "de"}  # default 0 drops other strata
        assert by_lang["en"] / totals["en"] > by_lang.get("de", 0) / totals["de"]

    def test_stratum_sample_is_subset_of_plain(self, documents):
        # same seed → stratified keep-set is the plain sample's keep-set
        # restricted per-stratum (the bucket is stratum-independent)
        plain = _ids(sampling.hash_sample(documents, 0.4, key_col="doc_id"))
        strat = sampling.stratified_hash_sample(
            documents, {"en": 0.4}, stratum_col="lang", key_col="doc_id",
            default_fraction=0.0)
        assert _ids(strat) == plain & _ids(documents.filter(F.col("lang") == "en"))

    def test_bad_fraction_raises(self, documents):
        with pytest.raises(ValueError, match="fraction"):
            sampling.stratified_hash_sample(
                documents, {"en": 2.0}, stratum_col="lang", key_col="doc_id")


class TestPackTokenBudget:
    @pytest.fixture(scope="class")
    def sized(self, documents):
        from faisssearcher_spark.functions.text import token_count
        return documents.select(
            "doc_id", token_count("text").alias("n_tokens")).cache()

    def test_bins_respect_budget_plus_one_doc(self, sized):
        res = sampling.pack_token_budget(sized, budget=500,
                                         size_col="n_tokens",
                                         key_col="doc_id", n_shards=4)
        stats = (res.groupBy("shard", "bin")
                 .agg(F.sum("n_tokens").alias("total"),
                      F.max("n_tokens").alias("biggest")).collect())
        for r in stats:
            # streaming-packing guarantee: overshoot < one document
            assert r["total"] < 500 + r["biggest"]

    def test_every_row_assigned_and_deterministic(self, sized):
        a = sampling.pack_token_budget(sized, budget=500,
                                       size_col="n_tokens",
                                       key_col="doc_id", n_shards=4)
        b = sampling.pack_token_budget(sized.repartition(11), budget=500,
                                       size_col="n_tokens",
                                       key_col="doc_id", n_shards=4)
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb and len(ra) == sized.count()

    def test_bins_fill_before_opening_next(self, sized):
        res = sampling.pack_token_budget(sized, budget=800,
                                         size_col="n_tokens",
                                         key_col="doc_id", n_shards=2)
        # within a shard, bin ids are non-decreasing in key order and a
        # new bin only opens once the running total passed the budget
        rows = sorted(res.collect(), key=lambda r: (r["shard"], r["doc_id"]))
        for prev, cur in zip(rows, rows[1:]):
            if prev["shard"] != cur["shard"]:
                continue
            assert cur["bin"] >= prev["bin"]
            if cur["bin"] > prev["bin"]:
                assert prev["cum_tokens"] + cur["n_tokens"] > 800 * cur["bin"]

    def test_bad_params_raise(self, sized):
        with pytest.raises(ValueError, match="budget"):
            sampling.pack_token_budget(sized, budget=0,
                                       size_col="n_tokens", key_col="doc_id")


class TestHashSplit:
    def test_partition_of_corpus(self, documents):
        res = sampling.hash_split(documents, key_col="doc_id",
                                  test_fraction=0.2)
        n = documents.count()
        counts = {r["split"]: r["n"] for r in
                  res.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert counts["test"] + counts["train"] == n
        assert 0 < counts["test"] < counts["train"]

    def test_split_stable_under_append(self, documents):
        # a doc's split must not change when the corpus grows
        half = documents.filter(F.col("doc_id") < 250)
        full_split = sampling.hash_split(documents, key_col="doc_id")
        half_split = sampling.hash_split(half, key_col="doc_id")
        full_map = {r["doc_id"]: r["split"] for r in
                    full_split.select("doc_id", "split").collect()}
        for r in half_split.select("doc_id", "split").collect():
            assert full_map[r["doc_id"]] == r["split"]

    def test_split_independent_of_sample(self, documents):
        """r3 ADVICE: all samplers used the same '{seed}|key' salt, so
        hash_sample(f) then hash_split(test_fraction=f) at default seeds
        tagged EVERY surviving row 'test' (train split silently empty).
        The op-salted hashes must give the sampled subset a split whose
        test rate tracks the nominal fraction, not 100%."""
        sampled = sampling.hash_sample(documents, 0.2, key_col="doc_id")
        split = sampling.hash_split(sampled, key_col="doc_id",
                                    test_fraction=0.2)
        counts = {r["split"]: r["n"] for r in
                  split.groupBy("split").agg(F.count("*").alias("n")).collect()}
        n = sum(counts.values())
        assert counts.get("train", 0) > 0 and counts.get("test", 0) > 0
        # binomial(n, 0.2) — allow a generous band, the degenerate case is 1.0
        assert counts["test"] / n < 0.6


class TestCapPerGroup:
    def test_caps_every_group(self, documents):
        out = sampling.cap_per_group(documents, group_col="source", cap=7,
                                     key_col="doc_id")
        sizes = {r["source"]: r["n"] for r in
                 out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        orig = {r["source"]: r["n"] for r in
                documents.groupBy("source").agg(F.count("*").alias("n"))
                .collect()}
        assert sizes
        for src, n in sizes.items():
            assert n == min(7, orig[src])

    def test_monotone_in_cap(self, documents):
        small = _ids(sampling.cap_per_group(documents, group_col="source",
                                            cap=3, key_col="doc_id"))
        big = _ids(sampling.cap_per_group(documents, group_col="source",
                                          cap=10, key_col="doc_id"))
        assert small <= big

    def test_partition_invariant(self, documents):
        a = _ids(sampling.cap_per_group(documents, group_col="source",
                                        cap=5, key_col="doc_id"))
        b = _ids(sampling.cap_per_group(documents.repartition(13),
                                        group_col="source", cap=5,
                                        key_col="doc_id"))
        assert a == b and a

    def test_decorrelated_from_bernoulli(self, documents):
        """'cap'-salted rank order must not replay the 'sample' draw: the
        cap survivors are not simply the lowest 'sample'-bucket rows."""
        capped = _ids(sampling.cap_per_group(documents, group_col="source",
                                             cap=20, key_col="doc_id"))
        n = len(capped)
        by_sample_bucket = documents.withColumn(
            "__b", sampling.sample_bucket("doc_id", op="sample"))
        w = __import__("pyspark").sql.Window.partitionBy("source") \
            .orderBy("__b", "doc_id")
        sample_rank = _ids(by_sample_bucket.withColumn(
            "__rn", F.row_number().over(w)).filter(F.col("__rn") <= 20))
        assert len(sample_rank) == n
        assert capped != sample_rank

    def test_validates_cap(self, documents):
        with pytest.raises(ValueError, match="cap"):
            sampling.cap_per_group(documents, group_col="source", cap=0,
                                   key_col="doc_id")


class TestTemperatureMixture:
    def test_alpha_one_is_proportional(self, documents):
        from faisssearcher_spark.operators.sampling import (
            temperature_fractions)
        fr = temperature_fractions(documents, stratum_col="source",
                                   target_rows=100, alpha=1.0)
        # natural proportions: every stratum keeps the SAME rate
        rates = set(round(v, 9) for v in fr.values())
        assert len(rates) == 1
        n = documents.count()
        assert next(iter(rates)) == pytest.approx(100 / n, rel=1e-6)

    def test_alpha_zero_equalizes_strata(self, documents):
        from faisssearcher_spark.operators.sampling import (
            temperature_fractions)
        counts = {r["source"]: r["n"] for r in documents.groupBy("source")
                  .agg(F.count("*").alias("n")).collect()}
        k = len(counts)
        fr = temperature_fractions(documents, stratum_col="source",
                                   target_rows=40, alpha=0.0)
        # expected rows per stratum equal: rate_s * n_s == target / k
        for s, rate in fr.items():
            assert rate * counts[s] == pytest.approx(40 / k, rel=1e-6)

    def test_rates_clip_at_one_and_sample_is_deterministic(self, documents):
        from faisssearcher_spark.operators.sampling import (
            temperature_fractions, temperature_mixture)
        n = documents.count()
        fr = temperature_fractions(documents, stratum_col="source",
                                   target_rows=n * 10, alpha=0.3)
        assert all(v == 1.0 for v in fr.values())   # no upsampling
        a = {r["doc_id"] for r in temperature_mixture(
            documents, stratum_col="source", key_col="doc_id",
            target_rows=100, alpha=0.3).select("doc_id").collect()}
        b = {r["doc_id"] for r in temperature_mixture(
            documents.repartition(5), stratum_col="source",
            key_col="doc_id", target_rows=100,
            alpha=0.3).select("doc_id").collect()}
        assert a == b and 0 < len(a) < n

    def test_alpha_upweights_small_sources(self, documents):
        """0 < alpha < 1: smaller strata keep a HIGHER rate."""
        from faisssearcher_spark.operators.sampling import (
            temperature_fractions)
        counts = {r["source"]: r["n"] for r in documents.groupBy("source")
                  .agg(F.count("*").alias("n")).collect()}
        fr = temperature_fractions(documents, stratum_col="source",
                                   target_rows=50, alpha=0.3)
        small = min(counts, key=counts.get)
        big = max(counts, key=counts.get)
        if counts[small] < counts[big]:
            assert fr[small] > fr[big]

    def test_validation(self, documents):
        from faisssearcher_spark.operators.sampling import (
            temperature_fractions)
        with pytest.raises(ValueError):
            temperature_fractions(documents, stratum_col="source",
                                  target_rows=0)
        with pytest.raises(ValueError):
            temperature_fractions(documents, stratum_col="source",
                                  target_rows=10, alpha=-1)


class TestTemperatureMixtureRates:
    def test_alpha_one_is_natural_distribution(self, documents):
        rates = sampling.temperature_mixture_rates(
            documents, stratum_col="source", alpha=1.0)
        for r in rates.values():
            assert r == pytest.approx(1.0)

    def test_flattening_upweights_tail(self, spark):
        """α < 1 must up-weight the small stratum and down-weight the
        big one, and expected output size must stay ≈ the corpus."""
        df = spark.createDataFrame(
            [(i, "big" if i < 900 else "small") for i in range(1000)],
            "id long, s string")
        rates = sampling.temperature_mixture_rates(
            df, stratum_col="s", alpha=0.5)
        assert rates["small"] > 1.0 > rates["big"]
        expected = 900 * rates["big"] + 100 * rates["small"]
        assert expected == pytest.approx(1000)

    def test_total_rows_scales_budget(self, spark):
        df = spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b") for i in range(100)],
            "id long, s string")
        r1 = sampling.temperature_mixture_rates(
            df, stratum_col="s", alpha=0.5)
        r2 = sampling.temperature_mixture_rates(
            df, stratum_col="s", alpha=0.5, total_rows=200)
        for s in r1:
            assert r2[s] == pytest.approx(2 * r1[s])

    def test_feeds_upsample_end_to_end(self, documents):
        rates = sampling.temperature_mixture_rates(
            documents, stratum_col="source", alpha=0.5)
        n_in = documents.count()
        n_out = sampling.upsample_mixture(
            documents, rates, stratum_col="source",
            key_col="doc_id").count()
        # fractional-rate hash draws wobble around the expectation
        assert abs(n_out - n_in) <= 0.2 * n_in

    def test_alpha_validated(self, documents):
        with pytest.raises(ValueError, match="alpha"):
            sampling.temperature_mixture_rates(
                documents, stratum_col="source", alpha=0.0)

    def test_null_stratum_is_a_real_group(self, spark):
        """NULL strata must not crash the sorted fold (its sibling
        temperature_fractions returns them too)."""
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None)], "id long, s string")
        rates = sampling.temperature_mixture_rates(
            df, stratum_col="s", alpha=0.5)
        assert set(rates) == {"a", None}
        assert rates[None] > rates["a"]    # smaller stratum up-weights


class TestUpsampleMixture:
    @staticmethod
    def _bucket(key, op="upsample", seed=42):
        import hashlib
        return int(hashlib.md5(f"{op}|{seed}|{key}".encode())
                   .hexdigest()[:8], 16) % 1_000_000

    def test_fractional_repeats_deterministic(self, documents):
        out = sampling.upsample_mixture(
            documents, {"src1": 2.5}, stratum_col="source",
            key_col="doc_id", default_rate=1.0)
        counts = out.groupBy("doc_id", "source").count().collect()
        for r in counts:
            if r["source"] == "src1":
                want = 2 + (1 if self._bucket(r["doc_id"]) < 500_000 else 0)
            else:
                want = 1
            assert r["count"] == want, r

    def test_rate_zero_drops_stratum(self, documents):
        out = sampling.upsample_mixture(
            documents, {"src1": 0.0}, stratum_col="source",
            key_col="doc_id")
        assert out.filter("source = 'src1'").count() == 0
        assert out.filter("source != 'src1'").count() == \
            documents.filter("source != 'src1'").count()

    def test_subunit_rate_is_downsample(self, documents):
        out = sampling.upsample_mixture(
            documents, {}, stratum_col="source", key_col="doc_id",
            default_rate=0.4)
        kept = {r["doc_id"] for r in out.select("doc_id").collect()}
        want = {r["doc_id"] for r in documents.select("doc_id").collect()
                if self._bucket(r["doc_id"]) < 400_000}
        assert kept == want

    def test_copies_numbered(self, documents):
        out = sampling.upsample_mixture(
            documents, {"src1": 3.0}, stratum_col="source",
            key_col="doc_id")
        rows = out.filter("source = 'src1'").groupBy("doc_id").agg(
            F.sort_array(F.collect_list("copy_no")).alias("c")).collect()
        assert rows and all(r["c"] == [0, 1, 2] for r in rows)

    def test_partition_invariant(self, documents):
        a = sampling.upsample_mixture(documents, {"src2": 1.7},
                                      stratum_col="source",
                                      key_col="doc_id")
        b = sampling.upsample_mixture(documents.repartition(13),
                                      {"src2": 1.7},
                                      stratum_col="source",
                                      key_col="doc_id")
        sa = sorted((r["doc_id"], r["copy_no"]) for r in a.collect())
        sb = sorted((r["doc_id"], r["copy_no"]) for r in b.collect())
        assert sa == sb

    def test_validation(self, documents):
        with pytest.raises(ValueError, match="rate"):
            sampling.upsample_mixture(documents, {"x": -1},
                                      stratum_col="source",
                                      key_col="doc_id")
        with pytest.raises(ValueError, match="default_rate"):
            sampling.upsample_mixture(documents, {}, stratum_col="source",
                                      key_col="doc_id", default_rate=-0.1)


class TestEpochShuffle:
    @staticmethod
    def _key(key, epoch=0, seed=42, copy=None):
        import hashlib
        s = f"epoch{epoch}|{seed}|{key}"
        if copy is not None:
            s += f"|{copy}"
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def test_key_matches_md5_replay(self, documents):
        rows = documents.select(
            "doc_id",
            sampling.epoch_order_key("doc_id", epoch=3).alias("k")
        ).collect()
        for r in rows:
            assert r["k"] == self._key(r["doc_id"], epoch=3)

    def test_epochs_decorrelated(self, documents):
        a = {r["doc_id"]: r["k"] for r in documents.select(
            "doc_id", sampling.epoch_order_key("doc_id", epoch=0)
            .alias("k")).collect()}
        b = {r["doc_id"]: r["k"] for r in documents.select(
            "doc_id", sampling.epoch_order_key("doc_id", epoch=1)
            .alias("k")).collect()}
        assert a != b
        # order itself changes, not just values
        ra = sorted(a, key=lambda d: (a[d], d))
        rb = sorted(b, key=lambda d: (b[d], d))
        assert ra != rb

    def test_copy_scatters_duplicates(self, documents):
        up = sampling.upsample_mixture(documents, {"src1": 3.0},
                                       stratum_col="source",
                                       key_col="doc_id")
        keyed = up.select(
            "doc_id", "copy_no",
            sampling.epoch_order_key("doc_id", copy_col="copy_no")
            .alias("k"))
        rows = keyed.filter("copy_no is not null").collect()
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r["doc_id"], set()).add(r["k"])
        for doc, ks in per_doc.items():
            if len(ks) > 1:
                break
        else:
            pytest.fail("no doc with multiple distinct copy keys")

    def test_shuffle_global_order(self, documents):
        out = sampling.shuffle_for_epoch(documents, key_col="doc_id",
                                         epoch=2, n_partitions=7)
        pdf = out.toPandas()          # partitions collect in range order
        keys = pdf["epoch_key"].tolist()
        assert keys == sorted(keys)
        assert set(pdf["doc_id"]) == {
            r["doc_id"] for r in documents.collect()}


class TestLeakageSafeSplit:
    @pytest.fixture()
    def pairs(self, spark):
        # clusters: {0,1,2} (chained), {10,11}; everything else singleton
        return spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long")

    def test_clusters_never_straddle(self, spark, documents, pairs):
        out = sampling.leakage_safe_split(documents, pairs, key_col="doc_id",
                                          test_fraction=0.5)
        tags = {r["doc_id"]: r["split"]
                for r in out.select("doc_id", "split").collect()}
        assert tags[0] == tags[1] == tags[2]
        assert tags[10] == tags[11]

    def test_singletons_match_hash_split(self, documents, pairs):
        clustered = {0, 1, 2, 10, 11}
        grouped = sampling.leakage_safe_split(documents, pairs,
                                              key_col="doc_id",
                                              test_fraction=0.5)
        plain = sampling.hash_split(documents, key_col="doc_id",
                                    test_fraction=0.5)
        g = {r["doc_id"]: r["split"] for r in grouped.collect()}
        p = {r["doc_id"]: r["split"] for r in plain.collect()}
        for k in p:
            if k not in clustered:
                assert g[k] == p[k]
        # the cluster representative (min id) keys the group tag, so its
        # own tag equals the plain split's — singleton behavior is the
        # degenerate cluster-of-one case of the same function
        assert g[0] == p[0] and g[10] == p[10]

    def test_precomputed_clusters_equivalent(self, documents, pairs):
        from faisssearcher_spark.operators.dedup import dedup_clusters
        via_pairs = sampling.leakage_safe_split(
            documents, pairs, key_col="doc_id", test_fraction=0.5)
        via_clusters = sampling.leakage_safe_split(
            documents, clusters=dedup_clusters(pairs), key_col="doc_id",
            test_fraction=0.5)
        a = {(r["doc_id"], r["split"]) for r in via_pairs.collect()}
        b = {(r["doc_id"], r["split"]) for r in via_clusters.collect()}
        assert a == b

    def test_partition_invariant(self, documents, pairs):
        a = sampling.leakage_safe_split(documents, pairs, key_col="doc_id",
                                        test_fraction=0.3)
        b = sampling.leakage_safe_split(documents.repartition(17), pairs,
                                        key_col="doc_id", test_fraction=0.3)
        sa = {(r["doc_id"], r["split"]) for r in a.collect()}
        sb = {(r["doc_id"], r["split"]) for r in b.collect()}
        assert sa == sb

    def test_keep_cluster_col(self, documents, pairs):
        out = sampling.leakage_safe_split(documents, pairs, key_col="doc_id",
                                          test_fraction=0.5,
                                          keep_cluster_col="cid")
        rows = {r["doc_id"]: r["cid"] for r in out.collect()}
        assert rows[1] == 0 and rows[11] == 10
        assert rows[5] is None            # singleton: no cluster id

    def test_duplicate_cluster_ids_do_not_duplicate_rows(self, spark,
                                                         documents):
        """A user-supplied clusters frame with duplicate ids must not
        fan out corpus rows through the left join; the survivor cluster
        is the MIN (deterministic, not dropDuplicates-arbitrary)."""
        dup = spark.createDataFrame(
            [(1, 7), (1, 3), (2, 3)], "id long, cluster_id long")
        out = sampling.leakage_safe_split(
            documents, clusters=dup, key_col="doc_id",
            test_fraction=0.5, keep_cluster_col="cid")
        assert out.count() == documents.count()
        rows = {r["doc_id"]: r["cid"] for r in out.collect()}
        assert rows[1] == 3 and rows[2] == 3

    def test_validation(self, documents, pairs):
        with pytest.raises(ValueError, match="exactly one"):
            sampling.leakage_safe_split(documents, key_col="doc_id")
        with pytest.raises(ValueError, match="exactly one"):
            sampling.leakage_safe_split(documents, pairs,
                                        clusters=pairs, key_col="doc_id")
        with pytest.raises(ValueError, match="fraction"):
            sampling.leakage_safe_split(documents, pairs, key_col="doc_id",
                                        test_fraction=1.5)
