"""North-star operator quality gates beyond row-parity: ANN recall vs
brute force, approx-distinct error bound, near-dup banding sanity,
multimodal plumbing determinism."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
    load_table,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.multimodal import (
    fake_decode_features,
    with_binary_payload,
)


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    qs = registry.all_queries()
    exact = {
        (r.probe_id, r.cand_id)
        for r in qs["q_sim_topk_bruteforce"](spark, sf_dir).collect()
    }
    approx = {
        (r.probe_id, r.cand_id)
        for r in qs["q_sim_ann"](spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"ANN recall {recall:.2f} below floor"


def test_ann_recall_survives_width_transition(spark, sf_dir):
    """GATED (not computed) recall at the adapted code width (ADVICE
    r12): n_planes_for widens bucket codes above 8k vectors, and for
    ~0.5-cosine ANN neighbors a single-bucket probe at 8 planes drops
    per-table collision to ~0.67⁸ ≈ 0.04 — union recall ~0.47, below
    the 0.6 floor the fixture-width test asserts. ann_probe_buckets
    compensates by probing every 1-bit-flip neighbor bucket. This test
    FORCES the 8-plane width on the fixture corpus (the width the
    first post-transition decade uses) and measures both variants
    against brute force: compensated recall must clear the floor, and
    the un-compensated single-bucket probe must be strictly worse —
    proving the multi-probe is the thing doing the work, not fixture
    luck."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        N_PROBES,
        TOP_K,
        _N_PLANES,
        ann_probe_buckets,
        bucketed_all_tables,
        cosine,
    )
    from pyspark.sql import Window as W

    qs = registry.all_queries()
    exact = {
        (r.probe_id, r.cand_id)
        for r in qs["q_sim_topk_bruteforce"](spark, sf_dir).collect()
    }
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    wide = 8  # first post-transition width (n_planes_for at ~50k vecs)
    assert wide > _N_PLANES  # the regime the fixture-width test misses
    bucketed = bucketed_all_tables(v, n_planes=wide)
    base_probes = bucketed.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("emb").alias("probe_emb"),
        "tbl",
        "bucket",
    )

    def topk(probes):
        cands = (
            bucketed.join(F.broadcast(probes), ["tbl", "bucket"])
            .filter(F.col("vec_id") != F.col("probe_id"))
            .select(
                "probe_id", "probe_emb", F.col("vec_id").alias("cand_id"), "emb"
            )
            .dropDuplicates(["probe_id", "cand_id"])
        )
        scored = cands.select(
            "probe_id",
            "cand_id",
            cosine(F.col("probe_emb"), F.col("emb")).alias("sim"),
        )
        w = W.partitionBy("probe_id").orderBy(
            F.col("sim").desc(), F.col("cand_id")
        )
        return {
            (r.probe_id, r.cand_id)
            for r in scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .collect()
        }

    plain = topk(base_probes)
    multi = topk(ann_probe_buckets(base_probes, wide))
    recall_plain = len(exact & plain) / len(exact)
    recall_multi = len(exact & multi) / len(exact)
    assert recall_multi >= 0.6, (
        f"multi-probe recall {recall_multi:.2f} below floor at 8 planes"
    )
    assert recall_multi > recall_plain, (recall_multi, recall_plain)


def test_ann_probe_expansion_identity_at_floor_width(spark, sf_dir):
    """At the floor width the expansion must be a no-op (the SAME frame,
    not an equivalent one) — fixture-scale plans and the static DuckDB
    oracle replay depend on bit-identical bucket probing."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _N_PLANES,
        ann_probe_buckets,
    )

    probes = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("probe_id"), F.lit(3).alias("bucket")
    )
    assert ann_probe_buckets(probes, _N_PLANES) is probes
    expanded = ann_probe_buckets(probes, _N_PLANES + 3)
    n = probes.count()
    # home bucket + one flip per plane, all distinct codes
    assert expanded.count() == n * (_N_PLANES + 3 + 1)
    assert (
        expanded.select("probe_id", "bucket").distinct().count()
        == n * (_N_PLANES + 3 + 1) / n * n
    )
    # width 12 enters the radius-2 regime (probe_radius_for): home +
    # every 1-bit + every 2-bit flip, all distinct codes
    deep = ann_probe_buckets(probes, 12)
    assert deep.count() == n * (1 + 12 + 12 * 11 // 2)
    assert (
        deep.select("probe_id", "bucket").distinct().count()
        == n * (1 + 12 + 12 * 11 // 2)
    )


def test_lsh_geometry_tables_pin_the_r14_decision():
    """The r14 geometry decision as executable arithmetic (VERDICT r13
    item 1): occupancy target 125 keeps every fixture scale (≤ 2000
    vectors, and anything to 4000) at the 5-plane floor — static
    oracles replay unchanged; the table count holds 0.9-cosine dedup
    candidate recall ≥ 0.98 per n_tables_for's formula (exactly the
    historical 16 through width 9, then growing — 17 at width 10, 20
    at width 11, as asserted below); the ANN probe
    radius deepens at width 12 where 1-bit flips fall through the 0.6
    union-recall floor. A change to any of these constants must
    consciously rewrite this test — and re-run the candidate audit +
    recall gates that justify it."""
    import math

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _MAX_TABLES,
        _RECALL_TARGET,
        _TARGET_BUCKET,
        n_planes_for,
        n_tables_for,
        probe_radius_for,
    )

    assert _TARGET_BUCKET == 125
    for n in (500, 2000, 4000):
        assert n_planes_for(n) == 5
    assert n_planes_for(50_000) == 9  # the 100× replica's width now
    assert [n_tables_for(w) for w in range(5, 10)] == [16] * 5
    assert [n_tables_for(w) for w in range(10, 17)] == [
        17,
        20,
        24,
        28,
        33,
        39,
        45,
    ]
    # the UDF's precomputed fan-out is exactly the maximum any width
    # can demand — no dead tables in the hot Arrow matmul
    assert _MAX_TABLES == n_tables_for(16)
    # q_dedup_semantic's oracle hard-codes LIMIT _SEM_K while its
    # served k floors at _IVF_K (via ivf_cells_for) — the two constants
    # must stay equal or the fixture oracle silently diverges
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        _SEM_K,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _IVF_K,
    )

    assert _SEM_K == _IVF_K
    # the formula the table encodes: T ⌈-covers⌉ the recall target at
    # the 0.9-cosine class floor for every width
    p = 1 - math.acos(0.9) / math.pi
    for w in range(5, 17):
        assert 1 - (1 - p**w) ** n_tables_for(w) >= _RECALL_TARGET - 0.02
    assert [probe_radius_for(w) for w in (5, 6, 11, 12, 16)] == [
        0,
        1,
        1,
        2,
        2,
    ]


def test_ann_recall_gated_at_width_13(spark, sf_dir):
    """VERDICT r13 what's-wrong #2, closed by gate: at width 13 — the
    n_planes_for output for ~2M-vector corpora — 1-bit multi-probe
    union recall falls through the 0.6 floor (~0.5 by the arithmetic in
    probe_radius_for), so the radius rule deepens to 2-bit flips and
    the table count grows to n_tables_for(13) = 28. This forces that
    full wide geometry on the fixture corpus and gates recall against
    brute force — and asserts the radius-1 probe really is worse, so
    the gate is measuring the deepened sequence, not fixture luck."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        N_PROBES,
        TOP_K,
        ann_probe_buckets,
        bucketed_all_tables,
        cosine,
        n_tables_for,
        probe_radius_for,
    )
    from pyspark.sql import Window as W

    wide = 13
    assert probe_radius_for(wide) == 2
    qs = registry.all_queries()
    exact = {
        (r.probe_id, r.cand_id)
        for r in qs["q_sim_topk_bruteforce"](spark, sf_dir).collect()
    }
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    bucketed = bucketed_all_tables(
        v, n_planes=wide, n_tables=n_tables_for(wide)
    )
    base_probes = bucketed.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("emb").alias("probe_emb"),
        "tbl",
        "bucket",
    )

    def topk(probes):
        cands = (
            bucketed.join(F.broadcast(probes), ["tbl", "bucket"])
            .filter(F.col("vec_id") != F.col("probe_id"))
            .select(
                "probe_id", "probe_emb", F.col("vec_id").alias("cand_id"), "emb"
            )
            .dropDuplicates(["probe_id", "cand_id"])
        )
        scored = cands.select(
            "probe_id",
            "cand_id",
            cosine(F.col("probe_emb"), F.col("emb")).alias("sim"),
        )
        w = W.partitionBy("probe_id").orderBy(
            F.col("sim").desc(), F.col("cand_id")
        )
        return {
            (r.probe_id, r.cand_id)
            for r in scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .collect()
        }

    # radius-1 control: the r13 geometry, rebuilt inline
    radius1 = base_probes.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(wide)
                ],
            )
        ),
    )
    shallow = topk(radius1)
    deep = topk(ann_probe_buckets(base_probes, wide))
    recall_shallow = len(exact & shallow) / len(exact)
    recall_deep = len(exact & deep) / len(exact)
    assert recall_deep >= 0.6, (
        f"radius-2 recall {recall_deep:.2f} below floor at width 13"
    )
    # >= not >: the radius-2 probe set is a strict SUPERSET of the
    # radius-1 buckets, so deep recall can never be lower — but on a
    # small fixture the extra buckets could in principle contribute no
    # new exact-top-k member, and a strict > would flake on a benign
    # fixture regeneration. The measured gap (0.3-class vs 0.9-class
    # on the current fixture) is recorded in SCALE.md r14.
    assert recall_deep >= recall_shallow, (recall_deep, recall_shallow)


def test_table_rows_matches_scan_count(spark, sf_dir):
    """catalog.table_rows (parquet-footer metadata, memoized) must agree
    with an actual scan for every fixture table — it now feeds the LSH
    width rules at plan-construction time."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        TABLES,
        table_rows,
    )

    for name in TABLES:
        assert table_rows(spark, sf_dir, name) == load_table(
            spark, sf_dir, name
        ).count(), name


def test_table_rows_skips_what_spark_skips(spark, tmp_path):
    """Directory layouts: footer counting must ignore the paths Spark's
    scan ignores (_temporary job attempts, _SUCCESS, dotfiles) or a
    crashed write would silently widen the LSH codes past what the
    scan justifies (r13 review finding). Builds a directory-shaped
    `documents` table with a stale _temporary attempt file and checks
    footer count == scan count."""
    import shutil

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        table_path,
        table_rows,
    )

    sf = str(tmp_path)
    d = os.path.join(sf, "documents.parquet")
    spark.range(10).selectExpr(
        "id AS doc_id", "'x' AS text", "'en' AS lang",
        "'t' AS source", "1 AS n_chars"
    ).write.parquet(d)
    # plant the debris a crashed Spark write leaves behind
    part = next(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )
    tmp_attempt = os.path.join(d, "_temporary", "0", "attempt_0")
    os.makedirs(tmp_attempt)
    shutil.copyfile(
        os.path.join(d, part), os.path.join(tmp_attempt, part)
    )
    shutil.copyfile(os.path.join(d, part), os.path.join(d, "." + part))
    assert table_path(sf, "documents") == d
    scan = spark.read.parquet(d).count()
    assert scan == 10
    assert table_rows(spark, sf, "documents") == scan


def test_ivf_geometry_rules_pin_the_r14_decision():
    """The IVF/SemDeDup cell-count rule as executable arithmetic: the
    similarity family's last FIXED geometry (k = 16 everywhere, which
    left SemDeDup's within-cell scan Θ(n²/16) with 'k grows at 100 TB'
    as prose) is now ⌈√(n/8)⌉ with the floor anchored exactly at the
    2000-vector fixture, and nprobe = ⌈√k⌉ with its floor exactly the
    historical 4 at k=16 — so every fixture-scale plan and LIMIT-16
    oracle replays bit-for-bit."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _IVF_K,
        _IVF_NPROBE,
        ivf_cells_for,
        ivf_nprobe_for,
    )

    for n in (500, 2000, 2048):
        assert ivf_cells_for(n) == _IVF_K == 16
    assert ivf_nprobe_for(ivf_cells_for(2000)) == _IVF_NPROBE == 4
    assert ivf_cells_for(4000) == 23
    assert ivf_cells_for(50_000) == 80
    assert ivf_cells_for(500_000) == 250
    assert ivf_nprobe_for(80) == 9
    assert ivf_nprobe_for(250) == 16


def test_ivf_planted_cluster_recall_at_wide_geometry(spark, sf_dir):
    """IVF's domain claim, gated at the POST-FLOOR geometry: on
    clusterable data a query's true nearest neighbor concentrates in
    its √k probed cells. Planted 0.90–0.96-cosine twins (the same
    corpus the LSH gates use) with k=80/nprobe=9 FORCED — the geometry
    a 50k-vector corpus gets from ivf_cells_for — must route each twin
    to a probe set containing its base vector's cell for ≥80% of
    pairs. The fixture-scale q_sim_ivf gate (floor 0.3 on near-random
    top-10) documents the uniform-data regime; this one pins the
    clustered regime the adaptive rule is designed for."""
    import numpy as np

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _route_cells_matmul,
        ivf_nprobe_for,
    )

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).collect()
    rng = np.random.RandomState(13)
    corpus_rows, twin_rows = [], []
    for r in base:
        v = np.asarray(r.emb, dtype=np.float64)
        v /= np.linalg.norm(v)
        eps = 0.33 + 0.15 * (r.vec_id % 7) / 6.0
        noise = rng.randn(len(v))
        noise -= noise.dot(v) * v
        noise *= eps / np.linalg.norm(noise)
        t = v + noise
        corpus_rows.append((int(r.vec_id), [float(x) for x in v]))
        twin_rows.append(
            (int(r.vec_id) + 1_000_000, [float(x) for x in t])
        )
    corpus = spark.createDataFrame(
        corpus_rows + twin_rows, "vec_id bigint, emb array<double>"
    )
    k = 80  # forced: the 50k-corpus geometry
    nprobe = ivf_nprobe_for(k)
    centroids = (
        corpus.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cell"), F.col("emb").alias("centroid"))
    )
    assigned = _route_cells_matmul(corpus, centroids, 1).select(
        "vec_id", "cell"
    )
    base_cell = {
        r.vec_id: r.cell
        for r in assigned.filter(F.col("vec_id") < 1_000_000).collect()
    }
    twins = corpus.filter(F.col("vec_id") >= 1_000_000)
    probed = (
        _route_cells_matmul(twins, centroids, nprobe)
        .groupBy("vec_id")
        .agg(F.collect_set("cell").alias("cells"))
        .collect()
    )
    hits = sum(
        1
        for r in probed
        if base_cell[r.vec_id - 1_000_000] in r.cells
    )
    recall = hits / len(probed)
    assert recall >= 0.8, (
        f"planted-twin IVF routing recall {recall:.3f} at k={k}/"
        f"nprobe={nprobe}"
    )


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    qs = registry.all_queries()
    exact = {
        (r.probe_id, r.cand_id)
        for r in qs["q_sim_topk_bruteforce"](spark, sf_dir).collect()
    }
    approx = {
        (r.probe_id, r.cand_id)
        for r in qs["q_sim_ivf"](spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    # near-random vectors barely cluster; nprobe/k = 1/4 of the corpus
    # searched should still recover a solid fraction of true neighbors
    assert recall >= 0.3, f"IVF recall {recall:.2f} below floor"


def test_approx_distinct_error(spark, sf_dir):
    # raw HLL++ estimate within 5% of exact per group
    orders = load_table(spark, sf_dir, "orders")
    rows = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("e"),
            F.approx_count_distinct("o_custkey", rsd=0.01).alias("a"),
        )
        .collect()
    )
    for r in rows:
        rel_err = abs(r.a - r.e) / r.e
        assert rel_err < 0.05, f"HLL rel error {rel_err:.3f} too high"
    # and the registered query reports the same invariant as all-green
    out = registry.all_queries()["q_agg_approx_distinct"](spark, sf_dir)
    assert all(r.within_tol == 1 for r in out.collect())


def test_minhash_band_space_fuse(spark, sf_dir):
    """VERDICT r13 item 5: prove (not narrate) that MinHash banding has
    no SimHash-class fixed-width chance-collision fuse. Two halves:
    (a) the arithmetic — chance pairs 4n²/2⁶⁴ stay below noise through
    the 100 TB regime and the fuse only approaches relevance around
    10¹² docs; (b) the structure the arithmetic rests on — band keys
    really are 64-bit hashes of the 4-minhash tuple (xxhash64 longs
    spanning the full signed range on the fixture), not bit-slices of
    a fixed-width fingerprint like pre-r13 SimHash."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        _N_BANDS,
        minhash_chance_pairs,
        minhash_signatures,
    )

    assert minhash_chance_pairs(2.5e10) < 1000  # 100 TB at 4 KB/doc
    assert minhash_chance_pairs(5e5) < 1e-7  # every measured probe scale
    assert minhash_chance_pairs(1e12) < 1e6  # where the fuse would blow
    sigs = minhash_signatures(spark, sf_dir)
    keyed = sigs.select(
        *[
            F.xxhash64(*[f"mh_{i}" for i in range(b * 4, b * 4 + 4)]).alias(
                f"bk_{b}"
            )
            for b in range(_N_BANDS)
        ]
    ).collect()
    vals = [getattr(r, f"bk_{b}") for r in keyed for b in range(_N_BANDS)]
    # full 64-bit signed range in use — both signs present and
    # magnitudes beyond any 32-bit truncation
    assert any(v < 0 for v in vals) and any(v > 0 for v in vals)
    assert max(abs(v) for v in vals) > 2**32


def test_minhash_banding_finds_true_near_dups(spark, sf_dir):
    """Quality gate against ground truth. Banding theory (8 bands × 4
    rows): P(miss) = (1−j⁴)⁸ ≈ 1.4e-6 at j=0.95, ≈1.5% at j=0.8. The
    fixture corpus shares a small vocabulary so token-SET jaccard runs
    high — thousands of true pairs make the recall measurement tight:
    every j ≥ 0.95 pair must surface, recall(j ≥ 0.8) ≥ 0.95, and the
    sketch estimate must track truth within sketch error."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = {r.doc_id: set(r.text.split()) for r in d.collect()}
    true_pairs = {}
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(toks[a] & toks[b])
            if not inter:
                continue
            j = inter / len(toks[a] | toks[b])
            if j >= 0.8:
                true_pairs[(a, b)] = j
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        minhash_lsh_pairs,
    )

    got = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_pairs(spark, sf_dir).collect()
    }
    # the registered query is the driver-facing view of the same
    # invariant: every true j>=0.95 pair flagged in_lsh
    inv = registry.all_queries()["q_dedup_near"](spark, sf_dir)
    assert all(r.in_lsh for r in inv.collect())
    certain = {p for p, j in true_pairs.items() if j >= 0.95}
    missed_certain = certain - set(got)
    assert not missed_certain, f"missed j>=0.95 pairs: {sorted(missed_certain)[:5]}"
    found = len(set(true_pairs) & set(got))
    recall = found / len(true_pairs)
    assert recall >= 0.95, f"recall(j>=0.8) = {recall:.3f}"
    for p in set(true_pairs) & set(got):
        assert abs(got[p] - true_pairs[p]) < 0.3, (p, true_pairs[p], got[p])


def test_minhash_signature_matches_python_reference(spark, sf_dir):
    """Independent CONSTRUCTION check (r11, simhash-lesson sweep): the
    banding/recall tests above all start from the signatures the system
    itself produced, so a systematically wrong signature could pass
    them (exactly how the degenerate pre-r11 simhash fingerprint
    survived — see test_simhash_hamming_bounds). Replay the affine
    permutations + min in pure Python from the collected token hashes
    (xxhash64 itself has no Python twin, so the hash step is fetched
    via a minimal Spark expression) and require exact equality. Also
    guards the no-overflow precondition the permutation relies on:
    h, a < 2³¹ so h·a+b < 2⁶² never wraps a bigint."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        _MERSENNE_P,
        _minhash_params,
        _N_HASHES,
        minhash_signatures,
    )

    sigs = {
        r.doc_id: [r[f"mh_{i}"] for i in range(_N_HASHES)]
        for r in minhash_signatures(spark, sf_dir).collect()
    }
    hashed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.transform(
            F.array_distinct(
                F.filter(F.split("text", " "), lambda w: w != "")
            ),
            lambda w: F.pmod(F.xxhash64(w), F.lit(_MERSENNE_P)),
        ).alias("h"),
    )
    params = _minhash_params()
    n_checked = 0
    for row in hashed.collect():
        assert all(0 <= h < _MERSENNE_P for h in row.h)
        if not row.h:
            continue
        want = [
            min((h * a + b) % _MERSENNE_P for h in row.h)
            for (a, b) in params
        ]
        assert sigs[row.doc_id] == want, row.doc_id
        n_checked += 1
    assert n_checked > 0
    # degenerate guard: the signature space must not collapse (13
    # distinct mh_0 values over 5k docs is legitimate for the 31-word
    # fixture vocabulary; ONE value for every doc is not)
    assert len({tuple(s) for s in sigs.values()}) > 2


def test_near_dup_self_consistency(spark, sf_dir):
    # every near-dup candidate pair must estimate jaccard in [0, 1] and
    # be ordered doc_a < doc_b with no duplicates
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        minhash_lsh_pairs,
    )

    rows = minhash_lsh_pairs(spark, sf_dir).collect()
    pairs = [(r.doc_a, r.doc_b) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in rows)


def test_dedup_clusters_are_transitive_and_keepered(spark, sf_dir):
    """Every near-dup edge's endpoints share a cluster; each cluster has
    exactly one keeper, and it is the minimum doc_id."""
    qs = registry.all_queries()
    cluster = {
        r.doc_id: r.cluster_id
        for r in qs["q_dedup_clusters"](spark, sf_dir).collect()
    }
    for r in qs["q_dedup_ngram_jaccard"](spark, sf_dir).collect():
        assert cluster[r.doc_a] == cluster[r.doc_b], (r.doc_a, r.doc_b)
    members: dict[int, list[int]] = {}
    for d, c in cluster.items():
        members.setdefault(c, []).append(d)
    for c, ds in members.items():
        assert c == min(ds)  # keeper is the component minimum


def test_chunking_is_edit_stable(spark, sf_dir):
    """The point of content-defined chunking: replacing a document's
    TAIL must not move any boundary that ends more than one shingle
    before the edit — chunks of the shared prefix are identical."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.text import (
        _SHINGLE_W,
        chunk_tokens,
    )

    base_words = [f"w{i % 13}x{i % 7}" for i in range(60)]
    edited = base_words[:40] + [f"z{i}" for i in range(25)]
    df = spark.createDataFrame(
        [(1, " ".join(base_words)), (2, " ".join(edited))],
        "doc_id long, text string",
    )
    rows = chunk_tokens(df).collect()
    chunks = {1: {}, 2: {}}
    for r in rows:
        chunks[r.doc_id][r.chunk_no] = r.n_tokens
    # boundaries at token i depend on words[i .. i+W-1]; positions
    # ≤ 40 − W have identical shingles in both docs, so every chunk
    # fully inside the shared prefix matches exactly
    shared, acc = [], 0
    for cn in sorted(chunks[1]):
        acc += chunks[1][cn]
        if acc > 40 - _SHINGLE_W:
            break
        shared.append(cn)
    assert shared, "fixture produced no prefix-complete chunk"
    for cn in shared:
        assert chunks[1][cn] == chunks[2][cn], (cn, chunks)


def test_multimodal_plumbing_deterministic(spark, sf_dir):
    df = with_binary_payload(spark, sf_dir).select("doc_id", "payload")
    out1 = {
        r.doc_id: (r.n_bytes, r.checksum)
        for r in df.mapInPandas(
            fake_decode_features,
            schema="doc_id bigint, n_bytes bigint, checksum bigint, feature_dim int",
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length(F.encode("text", "utf-8")).alias("n")
    )
    for r in docs.collect():
        assert out1[r.doc_id][0] == r.n


def test_langid_one_prediction_per_doc(spark, sf_dir):
    df = registry.all_queries()["q_text_langid"](spark, sf_dir)
    rows = df.collect()
    docs = [r.doc_id for r in rows]
    assert len(docs) == len(set(docs))  # argmax emits exactly one row/doc
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(docs) == n_docs
    langs = {
        r.lang for r in load_table(spark, sf_dir, "documents")
        .select("lang").distinct().collect()
    }
    assert all(r.pred_lang in langs for r in rows)


def test_simhash_hamming_bounds(spark, sf_dir):
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        _HAMMING_MAX,
        _SIMHASH_BANDS,
        _SIMHASH_BAND_WIDTH,
        simhash_band_pairs,
        simhash_fingerprints,
    )

    def fp(row):
        # reassemble the 4 × 32-bit band words into one 128-bit int so
        # the all-pairs reference below is a single xor/popcount
        v = 0
        for j in range(_SIMHASH_BANDS):
            w = row[f"sh{j}"]
            assert 0 <= w < (1 << _SIMHASH_BAND_WIDTH), (row.doc_id, j, w)
            v |= w << (j * _SIMHASH_BAND_WIDTH)
        return v

    sigs = {r.doc_id: fp(r) for r in simhash_fingerprints(spark, sf_dir).collect()}
    # identical text ⇒ identical fingerprint (determinism)
    sigs2 = {
        r.doc_id: fp(r) for r in simhash_fingerprints(spark, sf_dir).collect()
    }
    assert sigs == sigs2
    # INDEPENDENT construction check (r11): recompute the sign-sum in
    # pure Python from the collected token hashes and require bit-exact
    # equality. The older self-consistency assertions (determinism,
    # band completeness vs the collected sigs, hamming-0 invariant)
    # all PASSED while the fingerprint was degenerate — a PySpark
    # higher-order lambda arity trap bound each bit mask to the array
    # INDEX, collapsing every fingerprint to all-ones/all-zero (see
    # dedup.simhash_fingerprints.bit_test). Only a reference built
    # outside the Column expression catches that class of bug.
    hashed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.transform(
            F.array_distinct(
                F.filter(F.split("text", " "), lambda w: w != "")
            ),
            lambda w: F.xxhash64(w),
        ).alias("h_lo"),
        F.transform(
            F.array_distinct(
                F.filter(F.split("text", " "), lambda w: w != "")
            ),
            lambda w: F.xxhash64(F.lit(1), w),
        ).alias("h_hi"),
    )
    for row in hashed.collect():
        want_fp = 0
        for g in range(128):
            hs = row.h_lo if g < 64 else row.h_hi
            b = g % 64
            ones = sum(1 for h in hs if (h >> b) & 1)
            if ones * 2 > len(hs):
                want_fp |= 1 << g
        assert sigs[row.doc_id] == want_fp, row.doc_id
    # degenerate guard: fingerprints must not collapse to two values
    assert len(set(sigs.values())) > 2
    # band completeness (the pigeonhole losslessness claim): EVERY pair
    # at hamming ≤ 3 must surface from the banded join — checked against
    # a Python all-pairs scan over the collected fingerprints
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_band_pairs(spark, sf_dir).collect()
    }
    ids = sorted(sigs)
    want = {
        (a, b): (sigs[a] ^ sigs[b]).bit_count()
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if (sigs[a] ^ sigs[b]).bit_count() <= _HAMMING_MAX
    }
    assert got == want
    # the registered invariant view: identical-token-set pairs must all
    # be in-bands at hamming 0 (what the DuckDB oracle asserts)
    rows = registry.all_queries()["q_dedup_simhash"](spark, sf_dir).collect()
    assert rows  # fixture has identical-token-set dups
    assert all(r.hamming == 0 and r.in_bands == 1 for r in rows)


def test_simhash_wide_geometry_bit_exact(spark, sf_dir):
    """The 256-bit / 4×64-band geometry (engaged by
    _simhash_band_bits_for above ~4.6M docs) FORCED at fixture scale
    and held to the same bar as the 128-bit path: bit-exact equality
    with a pure-Python sign-sum over the collected token hashes (the
    r11 anti-degeneracy lesson — self-consistency checks pass on a
    degenerate fingerprint; only an independent construction catches
    it), plus band completeness for hamming ≤ 3 against an all-pairs
    scan. 64-bit band words may use the int64 sign bit, so the replay
    reduces them mod 2⁶⁴."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        _HAMMING_MAX,
        _SIMHASH_BANDS,
        _simhash_band_bits_for,
        simhash_band_pairs,
        simhash_fingerprints,
    )

    # the width rule itself: fixture/probe scales keep 32-bit bands
    # (oracle + baseline comparability), the transition (n ≈ 4.6M,
    # where expected chance candidates pass the absolute 10k budget)
    # enforces the ceiling rather than narrating it, and a 100 TB-class
    # corpus is firmly on the wide side
    for n, want in (
        (500, 32),
        (5000, 32),
        (500_000, 32),
        (4_000_000, 32),
        (5_000_000, 64),
        (10_000_000_000, 64),
    ):
        assert _simhash_band_bits_for(n) == want, n

    def fp(row):
        v = 0
        for j in range(_SIMHASH_BANDS):
            v |= (row[f"sh{j}"] % (1 << 64)) << (j * 64)
        return v

    sigs = {
        r.doc_id: fp(r)
        for r in simhash_fingerprints(spark, sf_dir, band_bits=64).collect()
    }
    toks = F.array_distinct(
        F.filter(F.split("text", " "), lambda w: w != "")
    )
    hashed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.transform(toks, lambda w: F.xxhash64(w)).alias("h0"),
        F.transform(toks, lambda w: F.xxhash64(F.lit(1), w)).alias("h1"),
        F.transform(toks, lambda w: F.xxhash64(F.lit(2), w)).alias("h2"),
        F.transform(toks, lambda w: F.xxhash64(F.lit(3), w)).alias("h3"),
    )
    for row in hashed.collect():
        fams = (row.h0, row.h1, row.h2, row.h3)
        want_fp = 0
        for g in range(256):
            hs = fams[g // 64]
            b = g % 64
            ones = sum(1 for h in hs if (h >> b) & 1)
            if ones * 2 > len(hs):
                want_fp |= 1 << g
        assert sigs[row.doc_id] == want_fp, row.doc_id
    assert len(set(sigs.values())) > 2  # non-degenerate
    # band completeness at the wide geometry (pigeonhole needs only
    # >=4 bands, so losslessness must survive the widening)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_band_pairs(spark, sf_dir, band_bits=64).collect()
    }
    ids = sorted(sigs)
    want = {
        (a, b): (sigs[a] ^ sigs[b]).bit_count()
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if (sigs[a] ^ sigs[b]).bit_count() <= _HAMMING_MAX
    }
    assert got == want
    # identical token sets still collide in every band at hamming 0 —
    # the driver-checked oracle invariant is geometry-independent
    assert want, "fixture should contain identical-token-set dups"
    assert 0 in want.values()


def test_lsh_bucket_udf_matches_expression_path(spark, sf_dir):
    """The vectorized matmul UDF and the pure-expression simhash_bucket
    must assign IDENTICAL (table, bucket) ids — the UDF is a physical
    optimization, not a semantic change."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _N_TABLES,
        bucketed_all_tables,
        simhash_bucket,
    )

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    via_udf = {
        (r.vec_id, r.tbl): r.bucket
        for r in bucketed_all_tables(v).collect()
    }
    for t in range(0, _N_TABLES, 5):  # spot-check a third of the tables
        via_expr = {
            (r.vec_id, t): r.b
            for r in v.select(
                "vec_id", simhash_bucket(F.col("emb"), 64, t).alias("b")
            ).collect()
        }
        for k, b in via_expr.items():
            assert via_udf[k] == b, k


def test_embed_cosine_nn_is_symmetric_top1(spark, sf_dir):
    rows = registry.all_queries()["q_dedup_embed_cosine"](spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs  # exactly one row per corpus vector
    assert all(
        -1.0 <= r.nn_cosine <= 1.0 for r in rows if r.nn_cosine is not None
    )
    assert all(r.doc_id != r.nn_id for r in rows if r.nn_id is not None)


def test_embed_cosine_lsh_recall_vs_allpairs(spark, sf_dir):
    """The registered LSH query must recover most exact nearest
    neighbors found by the all-pairs test oracle. Fixture vectors are
    near-random (NN cosine ≈ 0.5 → per-table bucket collision ≈ 0.13,
    ≈0.89 over 16 tables), so 0.6 is a conservative floor."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        embed_cosine_allpairs,
    )

    exact = {
        r.doc_id: r.nn_id
        for r in embed_cosine_allpairs(spark, sf_dir).collect()
    }
    approx = {
        r.doc_id: r.nn_id
        for r in registry.all_queries()["q_dedup_embed_cosine"](
            spark, sf_dir
        ).collect()
    }
    hits = sum(1 for d, nn in exact.items() if approx.get(d) == nn)
    recall = hits / len(exact)
    assert recall >= 0.6, f"LSH NN recall {recall:.2f} below floor"


def _planted_twin_recall(spark, sf_dir, n_planes: int, n_tables: int) -> float:
    """Candidate-recall of the dedup self-join on PLANTED 0.90–0.96-
    cosine twins at a forced (width, tables) geometry: every fixture
    vector gets a deterministic jittered twin in the threshold class,
    both sides go through the real Arrow bucket UDF, and the result is
    the fraction of planted pairs colliding in ≥1 table."""
    import numpy as np

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        bucketed_all_tables,
    )

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).collect()
    rng = np.random.RandomState(13)
    rows = []
    for r in base:
        v = np.asarray(r.emb, dtype=np.float64)
        v /= np.linalg.norm(v)
        # orthogonalized noise at a fixed relative magnitude puts the
        # twin's cosine at 1/sqrt(1+eps^2): eps=0.33 -> ~0.95,
        # eps=0.48 -> ~0.90. Vary eps per vector across the class.
        eps = 0.33 + 0.15 * (r.vec_id % 7) / 6.0
        noise = rng.randn(len(v))
        noise -= noise.dot(v) * v
        noise *= eps / np.linalg.norm(noise)
        t = v + noise
        cos = float(v.dot(t) / np.linalg.norm(t))
        assert 0.89 <= cos <= 0.96, cos
        rows.append((int(r.vec_id), [float(x) for x in v]))
        rows.append((int(r.vec_id) + 1_000_000, [float(x) for x in t]))
    v_df = spark.createDataFrame(rows, "vec_id bigint, emb array<double>")
    bucketed = bucketed_all_tables(v_df, n_planes=n_planes, n_tables=n_tables)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    found = {
        r.vid
        for r in a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") + 1_000_000 == F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vid"))
        .distinct()
        .collect()
    }
    return len(found) / len(base)


def test_embed_neardup_recall_gated_at_wide_code(spark, sf_dir):
    """The 0.9-cosine near-dup recall at the POST-TRANSITION code width,
    measured instead of computed (VERDICT r12 item 5: 'recall ≈ 0.996
    at 8 planes' was formula only — the fixture gate ran at width 5,
    and the fixture can't test it anyway: its max NN cosine is ~0.51,
    so there are no real near-dups to recall). Expected 1−(1−p⁸)¹⁶ ≈
    0.996 at p = 1−θ/π ≈ 0.856; floor 0.95 leaves room for the jitter
    landing at the hard edge of the class."""
    recall = _planted_twin_recall(spark, sf_dir, n_planes=8, n_tables=16)
    assert recall >= 0.95, (
        f"planted 0.9-cosine pair recall {recall:.3f} at 8 planes"
    )


def test_embed_neardup_recall_gated_at_width_13_with_grown_tables(
    spark, sf_dir
):
    """The r14 adaptive-tables rule, measured at width 13: at the
    historical FIXED 16 tables, planted 0.9-cosine recall would decay
    to 1−(1−0.856¹³)¹⁶ ≈ 0.90 — n_tables_for(13) = 28 holds the class
    floor at 1−(1−0.856¹³)²⁸ ≈ 0.98, and the measured mixed-class
    number sits above that. Floor 0.95: the design target with the
    class-mix margin, same discipline as the width-8 gate."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        n_tables_for,
    )

    recall = _planted_twin_recall(
        spark, sf_dir, n_planes=13, n_tables=n_tables_for(13)
    )
    assert recall >= 0.95, (
        f"planted 0.9-cosine pair recall {recall:.3f} at width 13 / "
        f"{n_tables_for(13)} tables"
    )


def test_ann_route_boundary_arithmetic():
    """The LSH→IVF cross-over as executable arithmetic (r15, VERDICT
    r14 item 4): the threshold is EXACTLY the n where n_planes_for
    first returns a capped width — i.e. where the occupancy ≤ target
    invariant hyperplane LSH is built on first breaks — not a tuned
    constant. Fixture and driver scales route 'lsh' with ~4000×
    margin."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _MAX_PLANES,
        _TARGET_BUCKET,
        ANN_IVF_CROSSOVER,
        ann_route,
        n_planes_for,
    )

    assert ANN_IVF_CROSSOVER == _TARGET_BUCKET * 2**_MAX_PLANES == 8_192_000
    # at the boundary the widest code still holds occupancy AT target;
    # one vector past it the cap bites
    assert n_planes_for(ANN_IVF_CROSSOVER) == _MAX_PLANES
    assert ann_route(ANN_IVF_CROSSOVER) == "lsh"
    assert ann_route(ANN_IVF_CROSSOVER + 1) == "ivf"
    for n in (500, 2000, 5_000_000):
        assert ann_route(n) == "lsh"
    assert ann_route(10**10) == "ivf"


def test_ann_delegates_to_ivf_past_crossover(spark, sf_dir, monkeypatch):
    """Behavior AT the boundary, tested rather than narrated: with the
    cross-over forced below the fixture corpus size, q_sim_ann must
    return exactly q_sim_ivf's rows (same deterministic pipeline both
    sides of the threshold — the delegation is a function call, not a
    reimplementation)."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions import (
        similarity,
    )

    ivf_rows = sorted(
        map(tuple, similarity.q_sim_ivf(spark, sf_dir).collect())
    )
    monkeypatch.setattr(similarity, "ANN_IVF_CROSSOVER", 10)
    routed_rows = sorted(
        map(tuple, similarity.q_sim_ann(spark, sf_dir).collect())
    )
    assert routed_rows == ivf_rows
    # and the schema the delegation preserves
    assert similarity.q_sim_ann(spark, sf_dir).columns == [
        "probe_id",
        "cand_id",
        "cosine_sim",
        "rnk",
    ]


def test_salt_splits_rule_arithmetic():
    """The per-bucket salting cap as executable arithmetic (r15,
    VERDICT r14 item 3): dormant (s=1) through exactly 4× the
    occupancy target, then ⌈occ/cap⌉ groups — so per-reducer pair work
    is bounded by occ·cap instead of occ². A change to _SALT_MAX_OCC
    must consciously rewrite this test and re-check the dormancy
    measurements (random-corpus max occ 318 < cap at 500k, planted-
    cluster 819 > cap — SCALE.md r14/r15)."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _SALT_MAX_OCC,
        _TARGET_BUCKET,
        salt_splits_for,
    )

    assert _SALT_MAX_OCC == 4 * _TARGET_BUCKET == 500
    assert salt_splits_for(1) == 1
    assert salt_splits_for(_SALT_MAX_OCC) == 1
    assert salt_splits_for(_SALT_MAX_OCC + 1) == 2
    assert salt_splits_for(819) == 2  # the planted-cluster study's peak
    assert salt_splits_for(10 * _SALT_MAX_OCC) == 10
    # the formula the column expression implements
    import math

    for occ in (1, 7, 499, 500, 501, 999, 1000, 1001, 123_456):
        assert salt_splits_for(occ) == max(1, math.ceil(occ / _SALT_MAX_OCC))


def test_salting_dormant_at_fixture_scale(spark, sf_dir):
    """The oracle-replay argument for q_dedup_embed_cosine's r15 plan
    change, MEASURED rather than narrated: every fixture (tbl, bucket)
    occupancy sits under _SALT_MAX_OCC, so the salt column is 1
    everywhere and the salted join degenerates to the historical
    pair set (the static DuckDB oracle replays bit-for-bit — which the
    driver check confirms independently)."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _SALT_MAX_OCC,
        bucketed_all_tables,
    )

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    occ_max = (
        bucketed_all_tables(v)
        .groupBy("tbl", "bucket")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert occ_max < _SALT_MAX_OCC, (
        f"fixture max occupancy {occ_max} reaches the salt cap "
        f"{_SALT_MAX_OCC} — the dormancy premise broke; re-derive"
    )


def test_salted_pairs_lossless_on_planted_clusters(spark, sf_dir):
    """The salting cap on the corpus class it exists for: a planted-
    cluster corpus (every fixture vector plus three tight ~0.95-cosine
    satellites → 4× the occupancy in exactly the clustered buckets)
    with the cap FORCED low enough to engage. The salted join must (a)
    actually split hot cells (s ≥ 2 somewhere — not a vacuous pass)
    and (b) emit EXACTLY the unsalted join's pair set — the lossless
    claim that lets the static oracle replay at any scale, salted or
    not."""
    import numpy as np

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        bucketed_all_tables,
        salt_splits_for,
        salted_half_pairs,
    )

    base = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .collect()
    )
    rng = np.random.RandomState(15)
    rows = []
    for r in base:
        v = np.asarray(r.emb, dtype=np.float64)
        v /= np.linalg.norm(v)
        rows.append((int(r.vec_id), [float(x) for x in v]))
        for j in range(3):  # tight satellites: same bucket w.h.p.
            noise = rng.randn(len(v))
            noise -= noise.dot(v) * v
            noise *= 0.30 / np.linalg.norm(noise)
            t = v + noise
            rows.append(
                (int(r.vec_id) + (j + 1) * 1_000_000, [float(x) for x in t])
            )
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, emb array<double>"
    )
    bucketed = bucketed_all_tables(corpus).drop("emb")
    cap = 40  # force engagement at test scale (production cap 500)
    occ_max = (
        bucketed.groupBy("tbl", "bucket")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert occ_max > cap, (
        f"test corpus max occupancy {occ_max} never exceeds the forced "
        f"cap {cap} — the engagement premise broke"
    )
    salted = salted_half_pairs(bucketed, max_occ=cap).dropDuplicates(
        ["doc_id", "nn_id"]
    )
    plain = (
        bucketed.alias("a")
        .join(
            bucketed.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("doc_id"),
            F.col("b.vec_id").alias("nn_id"),
        )
        .dropDuplicates(["doc_id", "nn_id"])
    )
    s_rows = sorted((r.doc_id, r.nn_id) for r in salted.collect())
    p_rows = sorted((r.doc_id, r.nn_id) for r in plain.collect())
    assert s_rows == p_rows, (
        f"salted pair set diverged: {len(s_rows)} vs {len(p_rows)} pairs"
    )
    # the hot cell split into ≥2 groups under the forced cap (the same
    # ceil the column expression computes)
    assert -(-occ_max // cap) >= 2
    # and the pure production rule is the same arithmetic at cap=500
    assert salt_splits_for(501) == 2


def test_band_salting_dormant_at_oracle_scales(spark, sf_dir):
    """r16 (VERDICT r15 item 2): the MinHash and SimHash band
    self-joins now route through salted_half_pairs with cell key
    (band_id, band_key). The oracle-replay argument, MEASURED at BOTH
    oracle scales (the test fixture and sf0.01, where the driver's
    DuckDB comparison runs): every band-cell occupancy sits under
    _SALT_MAX_OCC, so s = 1 everywhere, the salt columns degenerate,
    and both static oracles replay over the historical pair join. NOT
    asserted at sf0.1 — the self-similar fixture's near-dup clusters
    genuinely engage the cap there (minhash 8 cells over, occ_max
    2700; simhash 1, occ 710 — SCALE.md r16), which the planted-
    cluster lossless-equality test below covers."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        minhash_banded,
        minhash_signatures,
        simhash_banded,
        simhash_fingerprints,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _SALT_MAX_OCC,
    )

    sf_dirs = {sf_dir, "/root/testdata/sf0.01"}
    for d in sorted(sf_dirs):
        if not os.path.isdir(d):
            continue
        for name, banded in (
            ("minhash", minhash_banded(minhash_signatures(spark, d))),
            ("simhash", simhash_banded(simhash_fingerprints(spark, d))),
        ):
            occ_max = (
                banded.groupBy("band_id", "band_key")
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            assert occ_max < _SALT_MAX_OCC, (
                f"{name}@{d} max band-cell occupancy {occ_max} reaches "
                f"the salt cap {_SALT_MAX_OCC} — the oracle-scale "
                "dormancy premise broke"
            )


def test_band_salted_joins_lossless_on_planted_duplicate_cluster(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The band-join salting on the corpus class it exists for (r16,
    VERDICT r15 item 2 — the test_salted_pairs_lossless template
    applied to both band spaces): a corpus with a PLANTED duplicate
    cluster (31 identical texts → one occ≥31 cell in every band) and
    the cap FORCED low enough to engage. Each salted band join must
    (a) actually split the hot cells (s ≥ 4 at cap 8 — not a vacuous
    pass) and (b) emit EXACTLY the pair set of a dormant run (cap
    effectively infinite, where the salt provably degenerates to the
    historical join) — the lossless claim that lets both static
    oracles replay at any scale, salted or not."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        load_table,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions import (
        dedup,
        similarity,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
        evict_caches,
    )

    base = load_table(spark, sf_dir, "documents")
    seed = base.orderBy("doc_id").limit(1).collect()[0]
    clones = spark.createDataFrame(
        [
            (
                10_000_000 + j,
                seed.text,
                seed.lang,
                seed.source,
                seed.n_chars,
            )
            for j in range(30)
        ],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    planted = str(tmp_path / "planted")
    base.unionByName(clones).coalesce(1).write.parquet(
        planted + "/documents.parquet"
    )
    try:
        cap = 8
        for name, fn in (
            ("minhash", dedup.minhash_lsh_pairs),
            ("simhash", dedup.simhash_band_pairs),
        ):
            # engagement premise: the planted cluster exceeds the cap
            sigs = (
                dedup.minhash_signatures(spark, planted)
                if name == "minhash"
                else dedup.simhash_fingerprints(spark, planted)
            )
            banded = (
                dedup.minhash_banded(sigs)
                if name == "minhash"
                else dedup.simhash_banded(sigs)
            )
            occ_max = (
                banded.groupBy("band_id", "band_key")
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            assert occ_max > cap, (
                f"{name}: planted max occupancy {occ_max} never exceeds "
                f"the forced cap {cap} — the engagement premise broke"
            )
            assert -(-occ_max // cap) >= 4  # s ≥ 4: a real split
            monkeypatch.setattr(similarity, "_SALT_MAX_OCC", cap)
            engaged = sorted(map(tuple, fn(spark, planted).collect()))
            monkeypatch.setattr(similarity, "_SALT_MAX_OCC", 10**9)
            dormant = sorted(map(tuple, fn(spark, planted).collect()))
            assert engaged == dormant, (
                f"{name}: salted band join diverged — "
                f"{len(engaged)} vs {len(dormant)} rows"
            )
            assert len(engaged) >= 30 * 29 // 2  # the cluster's pairs
    finally:
        # tmp-corpus relations/memos must not linger in session state
        evict_caches(spark)


def test_framesample_counts_match_payload_math(spark, sf_dir):
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.multimodal import (
        _FRAME_BYTES,
        _FRAME_STRIDE,
    )

    got = {
        r.doc_id: r.n_sampled_frames
        for r in registry.all_queries()["q_multimodal_framesample"](
            spark, sf_dir
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length(F.encode("text", "utf-8")).alias("n")
    )
    for r in docs.collect():
        n_frames = max(1, r.n // _FRAME_BYTES)
        expected = len(range(0, n_frames, _FRAME_STRIDE))
        assert got[r.doc_id] == expected, r.doc_id


def test_decode_media_is_stubbed(spark, sf_dir):
    import pytest

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.multimodal import (
        decode_media,
    )

    with pytest.raises(NotImplementedError):
        next(decode_media(iter([])))


def test_pack_sequences_tiles_the_token_stream(spark, sf_dir):
    """Packing invariants: documents tile the concatenated token stream
    exactly — in (source, doc_id) order each doc starts where the
    previous ended, first/last sequence ids are consistent with token
    counts, and total sequences == ceil(total_tokens / budget)."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.sampling import (
        _PACK_BUDGET,
    )

    rows = (
        registry.all_queries()["q_pack_sequences"](spark, sf_dir)
        .orderBy("source", "doc_id")
        .collect()
    )
    cum = 0
    for r in rows:
        assert r.first_seq == cum // _PACK_BUDGET, r
        cum += r.n_tokens
        assert r.last_seq == (cum - 1) // _PACK_BUDGET, r
        assert r.n_splits == r.last_seq - r.first_seq
    assert rows[-1].last_seq == (cum - 1) // _PACK_BUDGET
    # every sequence id in [0, last] is covered by some document
    covered = set()
    for r in rows:
        covered.update(range(r.first_seq, r.last_seq + 1))
    assert covered == set(range(rows[-1].last_seq + 1))


def test_decontaminate_flags_exact_benchmark_overlap(spark, sf_dir):
    """A training doc sharing a full 8-gram with a benchmark doc must be
    flagged; recompute the overlap in Python on the collected fixture
    and compare the flag sets exactly."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        load_table,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.text import (
        _BENCH_SOURCE,
        _DECON_G,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()

    def grams(text):
        w = [t for t in text.split(" ") if t]
        return {
            " ".join(w[i : i + _DECON_G])
            for i in range(len(w) - _DECON_G + 1)
        }

    bench = set()
    for r in docs:
        if r.source == _BENCH_SOURCE:
            bench |= grams(r.text)
    expect = {
        r.doc_id: len(grams(r.text) & bench)
        for r in docs
        if r.source != _BENCH_SOURCE
    }
    got = {
        r.doc_id: r.n_shared_grams
        for r in registry.all_queries()["q_text_decontaminate"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_stratified_sample_is_exact_k_and_matches_naive_window(
    spark, sf_dir
):
    """The adaptive pre-thin + fallback must be invisible: the result
    equals the naive whole-corpus window rank, and every source yields
    exactly min(k, n_source) rows."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        load_table,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.sampling import (
        _STRAT_K,
        hash_bucket,
    )

    got = sorted(
        (r.doc_id, r.source, r.rk)
        for r in registry.all_queries()["q_sample_stratified"](
            spark, sf_dir
        ).collect()
    )
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        hash_bucket(F.col("text")), F.md5("text"), "doc_id"
    )
    naive = sorted(
        (r.doc_id, r.source, r.rk)
        for r in d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _STRAT_K)
        .collect()
    )
    assert got == naive
    per_source = {}
    for _, src, _ in got:
        per_source[src] = per_source.get(src, 0) + 1
    totals = {
        r.source: r.n
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_source == {
        s: min(_STRAT_K, n) for s, n in totals.items()
    }


def test_unigram_logprob_ranks_rare_token_docs_lower(spark, sf_dir):
    """Sanity on the quality signal: recompute the unigram LM in Python
    on the collected fixture and compare per-doc scores; the doc whose
    tokens are rarest corpus-wide must rank lowest."""
    import math

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    lm: dict[str, int] = {}
    toks = {}
    for r in docs:
        ws = [t for t in r.text.split(" ") if t]
        toks[r.doc_id] = ws
        for t in ws:
            lm[t] = lm.get(t, 0) + 1
    n = float(sum(lm.values()))
    expect = {
        d: round(sum(math.log(lm[t] / n) for t in ws) / len(ws), 6)
        for d, ws in toks.items()
    }
    got = {
        r.doc_id: r.avg_logprob
        for r in registry.all_queries()["q_text_unigram_logprob"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(expect)
    for d in got:
        assert abs(got[d] - expect[d]) < 1e-5, d
    assert min(got, key=got.get) == min(expect, key=expect.get)


def test_lsh_oracle_planes_match_plane_coeff():
    """The q_sim_ann / q_dedup_embed_cosine oracles replay the LSH
    hyperplanes in SQL (_LSH_ORACLE_PLANES); this pins the cross-engine
    contract at its root: all 16x5x64 DuckDB-computed coefficients must
    equal _plane_coeff bit-for-bit. A drift in either side otherwise
    surfaces only as an opaque full-query hash mismatch."""
    import duckdb

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _LSH_ORACLE_PLANES,
        _plane_coeff,
    )

    con = duckdb.connect()
    # the fragment's downstream CTEs reference an embeddings view; give
    # the binder a trivial one (the coeffs CTE itself reads no table)
    con.execute(
        "CREATE VIEW embeddings AS SELECT 0 AS vec_id, "
        "[0.0] AS embedding WHERE 1=0"
    )
    rows = con.execute(
        f"WITH {_LSH_ORACLE_PLANES} SELECT t, p, d, coeff FROM coeffs"
    ).fetchall()
    assert len(rows) == 16 * 5 * 64
    for t, p, d, c in rows:
        assert c == _plane_coeff(t, p, d), (t, p, d)


def test_ivf_tie_margins_dominate_float_error(sf_dir):
    """Cross-engine dist² parity guard (ADVICE r4): the oracle sums the
    64 squared-difference terms in GROUP BY (unordered) order, Spark in
    a sequential fold. A nearest-centroid or probe-routing decision
    could only flip between engines if a rank-adjacent dist² gap were
    comparable to summation-order error (~64·eps·|dist²| ≈ 2e-14 here).
    Re-measures the margins on the CURRENT fixture so a regenerated
    dataset that lands a genuine near-tie fails loudly instead of
    producing a mystery driver hash-mismatch."""
    import duckdb
    import numpy as np

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _IVF_K,
        _IVF_NPROBE,
        N_PROBES,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    rows = con.execute(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows])
    cids = [
        r[0]
        for r in con.execute(
            "SELECT vec_id FROM (SELECT vec_id, "
            "md5(CAST(vec_id AS VARCHAR)) h FROM embeddings) "
            f"ORDER BY h, vec_id LIMIT {_IVF_K}"
        ).fetchall()
    ]
    cent = x[np.searchsorted(ids, cids)]
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    d2_sorted = np.sort(d2, axis=1)
    assign_gap = float((d2_sorted[:, 1] - d2_sorted[:, 0]).min())
    probe_sorted = np.sort(d2[ids < N_PROBES], axis=1)
    route_gap = float(
        (probe_sorted[:, _IVF_NPROBE] - probe_sorted[:, _IVF_NPROBE - 1]).min()
    )
    # 1e-9 floor = still >1e4x the worst-case reorder error, but small
    # enough that any real fixture passes (measured: >=1.6e-5 assign)
    assert assign_gap > 1e-9, f"near-tie centroid assignment: {assign_gap}"
    assert route_gap > 1e-9, f"near-tie probe routing: {route_gap}"


def test_pq_tie_margins_dominate_float_error(sf_dir):
    """q_embed_pq twin of the IVF margin guard: per-sub-space nearest-
    code argmin compares 8-term squared distances summed in different
    orders across engines; the min rank-1->rank-2 gap must dwarf
    summation-order error (~8*eps*|d2| ~ 2e-15) on the CURRENT
    fixture."""
    import duckdb
    import numpy as np

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _PQ_KS,
        _PQ_M,
        _PQ_SUB,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    rows = con.execute(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows])
    cids = [
        r[0]
        for r in con.execute(
            "SELECT vec_id FROM (SELECT vec_id, "
            "md5(CAST(vec_id AS VARCHAR)) h FROM embeddings) "
            f"ORDER BY h, vec_id LIMIT {_PQ_KS}"
        ).fetchall()
    ]
    cent = x[np.searchsorted(ids, cids)]
    worst = np.inf
    for m in range(_PQ_M):
        sl = slice(m * _PQ_SUB, (m + 1) * _PQ_SUB)
        d2 = ((x[:, None, sl] - cent[None, :, sl]) ** 2).sum(axis=2)
        d2s = np.sort(d2, axis=1)
        worst = min(worst, float((d2s[:, 1] - d2s[:, 0]).min()))
    assert worst > 1e-9, f"near-tie PQ code assignment: {worst}"


def test_pq_adc_recall_vs_exact_euclidean(spark, sf_dir):
    """ADC top-k approximates EUCLIDEAN nearest neighbors (the measure
    PQ codes quantize) — gate it against the exact euclidean top-k, not
    the cosine brute-force key. The iid-uniform fixture is PQ's
    worst case (no cluster structure, concentrated distances): measured
    mean recall 0.24 at both sf0.001/sf0.01 with KS=64; floor 0.10
    leaves regeneration headroom while still catching a broken
    code/table join (recall ~1/50 under random ranking)."""
    import duckdb
    import numpy as np

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        N_PROBES,
        TOP_K,
    )

    qs = registry.all_queries()
    adc = {}
    for r in qs["q_sim_pq_adc"](spark, sf_dir).collect():
        adc.setdefault(r.probe_id, set()).add(r.cand_id)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    rows = con.execute(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows])
    recalls = []
    for p in range(N_PROBES):
        pi = int(np.searchsorted(ids, p))
        ed = ((x - x[pi]) ** 2).sum(axis=1)
        ed[pi] = np.inf
        exact = set(ids[np.argsort(ed, kind="stable")[:TOP_K]].tolist())
        recalls.append(len(exact & adc.get(p, set())) / TOP_K)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.10, f"ADC euclidean recall {mean:.2f} below floor"


def test_pair_cache_keyed_per_corpus(spark):
    """The verified-pairs memo (dedup._PAIR_CACHE) must key on the
    corpus path: serving one sf_dir's persisted pairs to another would
    silently corrupt every downstream dedup result."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        ngram_jaccard_pairs,
    )

    a = ngram_jaccard_pairs(spark, "/root/testdata/sf0.001")
    b = ngram_jaccard_pairs(spark, "/root/testdata/sf0.01")
    a2 = ngram_jaccard_pairs(spark, "/root/testdata/sf0.001")
    assert a is a2, "same corpus must hit the memo"
    assert a is not b, "different corpora must never share a memo entry"
    # and the cached plans genuinely read different inputs
    pa = a.sparkSession._jvm.PythonSQLUtils.explainString(
        a._jdf.queryExecution(), "simple"
    )
    pb = b.sparkSession._jvm.PythonSQLUtils.explainString(
        b._jdf.queryExecution(), "simple"
    )
    assert "sf0.001" in pa and "sf0.001" not in pb


def test_semantic_tie_margins_dominate_float_error(sf_dir):
    """q_dedup_semantic twin of the IVF margin guard. Two cross-engine
    decisions exist: nearest-centroid assignment (dist² fold vs GROUP BY
    sum — same centroid rule as IVF) and the cosine-vs-τ threshold.
    Re-measured on the CURRENT fixture so a regenerated dataset that
    lands a genuine near-tie fails loudly here, not as a driver
    hash-mismatch."""
    import duckdb
    import numpy as np

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        _SEM_K,
        _SEM_TAU,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    rows = con.execute(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows])
    cids = [
        r[0]
        for r in con.execute(
            "SELECT vec_id FROM (SELECT vec_id, "
            "md5(CAST(vec_id AS VARCHAR)) h FROM embeddings) "
            f"ORDER BY h, vec_id LIMIT {_SEM_K}"
        ).fetchall()
    ]
    cent = x[np.searchsorted(ids, cids)]
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    d2_sorted = np.sort(d2, axis=1)
    assign_gap = float((d2_sorted[:, 1] - d2_sorted[:, 0]).min())
    assert assign_gap > 1e-9, f"near-tie centroid assignment: {assign_gap}"
    # threshold margin: min |cosine - tau| over within-cluster pairs
    assign = np.array(
        [np.array(cids)[np.lexsort((cids, d2[i]))[0]] for i in range(len(ids))]
    )
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    tau_margin = 1.0
    for c in cids:
        m = np.where(assign == c)[0]
        if len(m) < 2:
            continue
        sims = (xn[m] @ xn[m].T)[np.triu_indices(len(m), 1)]
        tau_margin = min(tau_margin, float(np.abs(sims - _SEM_TAU).min()))
    # measured >= 1.6e-5 across fixtures; reorder error of a 64-term
    # double dot product is ~2e-14
    assert tau_margin > 1e-9, f"near-tie cosine threshold: {tau_margin}"


def test_semantic_dedup_drops_are_witnessed(spark, sf_dir):
    """Every dropped vector's keeper must (a) precede it by id, (b) live
    in the same cluster, and (c) actually clear the cosine threshold —
    the end-to-end SemDeDup contract, checked against the registered
    query's own output plus a recomputed cosine."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        load_table,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        _SEM_TAU,
        q_dedup_semantic,
    )

    res = q_dedup_semantic(spark, sf_dir)
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert res.count() == n_total  # one row per corpus vector
    rows = res.collect()  # 500 fixture rows — fine to verify driver-side
    cell_of = {r["vec_id"]: r["cell"] for r in rows}
    dropped = [r for r in rows if r["is_semantic_dup"] == 1]
    assert dropped, "fixture should contain semantic dups"
    for r in dropped:
        assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
        assert cell_of[r["dup_of"]] == r["cell"]  # keeper in same cluster
    assert all(r["dup_of"] is None for r in rows if r["is_semantic_dup"] == 0)
    # cosine(vec, keeper) >= tau — recomputed independently (numpy)
    import numpy as np

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    for r in dropped:
        a, b = emb[r["vec_id"]], emb[r["dup_of"]]
        sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert sim >= _SEM_TAU, (r["vec_id"], r["dup_of"], sim)


def test_substring_dedup_fixture_sanity(spark, sf_dir):
    """On the real corpus: one row per doc, dup counts bounded by
    shingle counts, and the fixture's planted near-dups must surface as
    shared spans (a duplicated shingle needs >=2 docs, so flagged docs
    always come in groups of >=2)."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        load_table,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        q_dedup_substring,
    )

    res = q_dedup_substring(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    assert res.count() == d.count()
    assert (
        res.filter(F.col("n_dup_shingles") > F.col("n_shingles")).count() == 0
    )
    n_flagged = res.filter(F.col("has_dup_span") == 1).count()
    assert n_flagged >= 2, "fixture should contain shared spans"


def test_substring_dedup_constructed_corpus():
    """Adversarial constructed corpus for the span detector:

    - an exact copy pair -> both docs 100% duplicated;
    - a doc embedding another doc's >=k-word span inside fresh text ->
      the span's windows (and only those) flagged on BOTH sides;
    - a doc shorter than the shingle width -> zero shingles;
    - an unrelated doc -> zero duplicated windows.
    """
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        _SUBSTR_K,
        substring_dup_stats,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
        get_spark,
    )

    spark = get_spark("test")
    k = _SUBSTR_K
    span = " ".join(f"s{i}" for i in range(k))  # exactly k words
    docs = [
        (1, "a b " + span + " y z"),  # span embedded mid-doc
        (2, span),  # the bare span (exact k words)
        (3, "one two three"),  # shorter than k -> no shingles
        (4, " ".join(f"u{i}" for i in range(3 * k))),  # unrelated
        (5, " ".join(f"u{i}" for i in range(3 * k))),  # exact copy of 4
    ]
    res = {
        r["doc_id"]: r
        for r in substring_dup_stats(
            spark.createDataFrame(docs, ["doc_id", "text"])
        ).collect()
    }
    # doc 1: k+4 words -> 5 windows, exactly 1 (the span itself) shared
    assert res[1]["n_shingles"] == 5
    assert res[1]["n_dup_shingles"] == 1
    assert res[1]["has_dup_span"] == 1
    # doc 2: single window, fully duplicated
    assert res[2]["n_shingles"] == 1
    assert res[2]["dup_span_frac"] == 1.0
    # doc 3: below shingle width
    assert res[3]["n_shingles"] == 0
    assert res[3]["has_dup_span"] == 0
    # docs 4/5: exact copies -> every window duplicated on both sides
    for d_id in (4, 5):
        assert res[d_id]["n_shingles"] == 2 * k + 1
        assert res[d_id]["dup_span_frac"] == 1.0


def test_vocab_two_phase_matches_global_window(spark, sf_dir):
    """q_text_vocab's bucketed two-phase rank/prefix-sum must equal the
    naive single-global-window construction exactly (the oracle uses
    the naive form; this pins the distributed trick's equivalence on
    the Spark side too, independent of DuckDB)."""
    from pyspark.sql import Window as W

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.text import (
        _VOCAB_SIZE,
        q_text_vocab,
        tokenized,
    )

    res = q_text_vocab(spark, sf_dir)
    counts = tokenized(spark, sf_dir).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.orderBy(F.col("cnt").desc(), "word")
    tot = counts.agg(F.sum("cnt").alias("t"))
    naive = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(w).cast("bigint").alias("rnk"),
            "word",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(
                F.sum("cnt")
                .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                / F.col("t"),
                6,
            ).alias("coverage"),
        )
        .filter(F.col("rnk") <= _VOCAB_SIZE)
    )
    got = sorted(map(tuple, res.collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want
    # coverage is monotone in rank and hits 1.0 if the whole vocab fits
    by_rank = sorted(got)
    assert all(
        a[3] <= b[3] for a, b in zip(by_rank, by_rank[1:])
    )
    if len(by_rank) < _VOCAB_SIZE:
        assert by_rank[-1][3] == 1.0


def test_framedup_constructed_pairs():
    """Frame-fingerprint dedup ground truth on a constructed corpus:
    two payloads sharing their first 8 x 64-byte frames (sampled frames
    0 and 4) match with n_frame_matches == 2; a payload with entirely
    distinct bytes matches nothing."""
    import pandas as pd

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.multimodal import (
        sample_frames,
    )

    shared = bytes(range(200)) * 3  # 600 bytes -> frames 0..8 shared
    a = shared + b"A" * 64
    b_ = shared + b"B" * 64
    c = bytes(255 - x for x in range(250))  # different content
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "payload": [a, b_, c]})
    frames = list(sample_frames(iter([pdf])))[0]
    # pair-match replay: count equal CRCs across docs
    from collections import defaultdict

    by_doc = defaultdict(list)
    for _, r in frames.iterrows():
        by_doc[r["doc_id"]].append(r["frame_crc"])
    m12 = sum(1 for x in by_doc[1] for y in by_doc[2] if x == y)
    m13 = sum(1 for x in by_doc[1] for y in by_doc[3] if x == y)
    # 664-byte payloads -> 10 frames, sampled 0, 4, 8; frame 8 spans
    # bytes 512..575, inside the 600-byte shared prefix -> all 3 match
    assert m12 == 3, (m12, by_doc)
    assert m13 == 0
    assert len(by_doc[1]) == 3
    assert len(by_doc[3]) == 1  # 250 bytes -> 3 frames, only 0 sampled


def test_ivf_matmul_routing_matches_fold_path(spark, sf_dir):
    """The Arrow-matmul centroid routing (default ON since r6, see
    _matmul_routing_enabled) must reproduce the interpreted fold path's
    q_sim_ivf output EXACTLY: same cells, same probe routing, same
    final top-k. The measured assignment / routing margins
    (test_ivf_tie_margins_dominate_float_error) are what guarantees
    summation-order differences cannot flip a decision; this test pins
    the end-to-end consequence — and keeps the
    spark.aub.vectorRouting=fold escape hatch honest."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions import (
        similarity,
    )

    def run():
        return sorted(
            tuple(r)
            for r in similarity.q_sim_ivf(spark, sf_dir).collect()
        )

    assert similarity._matmul_routing_enabled(spark)  # default ON
    matmul = run()
    spark.conf.set("spark.aub.vectorRouting", "fold")
    try:
        assert not similarity._matmul_routing_enabled(spark)
        fold = run()
    finally:
        spark.conf.unset("spark.aub.vectorRouting")
    assert fold == matmul


def test_semantic_matmul_routing_matches_fold_path(spark, sf_dir):
    """q_dedup_semantic shares q_sim_ivf's matmul centroid routing
    (default ON) — same end-to-end output-identity requirement (see
    test_ivf_matmul_routing_matches_fold_path)."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions import (
        dedup,
        similarity,
    )

    def run():
        return sorted(
            tuple(r)
            for r in dedup.q_dedup_semantic(spark, sf_dir).collect()
        )

    assert similarity._matmul_routing_enabled(spark)  # default ON
    matmul = run()
    spark.conf.set("spark.aub.vectorRouting", "fold")
    try:
        fold = run()
    finally:
        spark.conf.unset("spark.aub.vectorRouting")
    assert fold == matmul


def test_sim_timeseries_topk_shape_and_bounds(spark, sf_dir):
    """q_sim_timeseries (r8): per probe exactly min(k, candidates)
    neighbors with dense ranks 1..k, cosine in [0, 1] (profiles are
    nonnegative counts), no self-pairs, and a brute-force cosine check
    of the top-1 neighbor for the lowest probe user."""
    import math
    from collections import defaultdict

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.operators.behavior import (
        _TS_TOPK,
        q_sim_timeseries,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        load_table,
    )

    rows = q_sim_timeseries(spark, sf_dir).collect()
    per_probe = defaultdict(list)
    for r in rows:
        assert r.probe_user != r.cand_user
        assert 0.0 <= r.cosine_sim <= 1.0 + 1e-9
        per_probe[r.probe_user].append(r)
    for probe, rs in per_probe.items():
        assert sorted(x.rnk for x in rs) == list(range(1, len(rs) + 1))
        assert len(rs) <= _TS_TOPK
    # brute-force the top-1 for the lowest probe user in plain python
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    prof = defaultdict(lambda: [0.0] * 24)
    for e in ev:
        prof[e.user_id][e.ts.hour] += 1.0
    probe = min(per_probe)
    pv = prof[probe]
    best = max(
        (
            (
                sum(a * b for a, b in zip(pv, v))
                / (
                    math.sqrt(sum(a * a for a in pv))
                    * math.sqrt(sum(b * b for b in v))
                ),
                -u,
            )
            for u, v in prof.items()
            if u != probe
        ),
    )
    got1 = next(r for r in per_probe[probe] if r.rnk == 1)
    assert got1.cand_user == -best[1]
    assert abs(got1.cosine_sim - round(best[0], 6)) < 1e-9


def test_rollhash_fingerprint_matches_python_reference(spark, sf_dir):
    """Independent CONSTRUCTION replay for the winnowing sketch (r11
    task 4 audit): q_text_rollhash's DuckDB oracle recomputes the
    shingle→md5→min pipeline from raw text, but BOTH engines implement
    "md5 of the space-joined 5-token window, lexicographic min" — a
    shared-convention bug (wrong window bounds mirrored in the SQL, a
    joint misunderstanding of slice semantics) would pass it. This
    replay is a THIRD implementation: hashlib.md5 over plain Python
    string slicing, no Spark, no DuckDB — exact equality required on
    every document."""
    import hashlib

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.text import (
        _SHINGLE_W,
        q_text_rollhash,
    )

    got = {
        r.doc_id: (r.n_shingles, r.min_shingle_fp)
        for r in q_text_rollhash(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    n_checked = 0
    for d in docs:
        words = d.text.split(" ")  # split(' ') keeps empty tokens,
        # matching F.split(text, ' ') / DuckDB string_split exactly
        n = len(words) - _SHINGLE_W + 1
        if n < 1:
            assert d.doc_id not in got
            continue
        fps = [
            hashlib.md5(
                " ".join(words[i : i + _SHINGLE_W]).encode("utf-8")
            ).hexdigest()
            for i in range(n)
        ]
        assert got[d.doc_id] == (n, min(fps)), d.doc_id
        n_checked += 1
    assert n_checked > 0
    # degeneracy guard (the r11 simhash lesson): the fingerprint space
    # must not collapse to a constant across the corpus
    assert len({fp for _, fp in got.values()}) > 2


def test_pq_codes_match_python_reference(spark, sf_dir):
    """Independent CONSTRUCTION replay for the PQ sub-codebook argmin
    (r11 task 4 audit): the q_embed_pq/q_sim_pq_adc oracles recompute
    sample→slice→distance→argmin in DuckDB, and the tie-margin test
    bounds cross-engine float error — but the md5-ranked codebook
    sample there is still fetched FROM DuckDB. This replay rebuilds
    the whole construction third-hand: hashlib.md5 ranks the sample,
    numpy slices and argmins, ties break (d2, k) — per-(vec, subspace)
    code equality and mse agreement required."""
    import hashlib

    import numpy as np

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
        _PQ_KS,
        _PQ_M,
        _PQ_SUB,
        pq_codes,
    )

    got = {
        (r.vec_id, r.m): (r.b.k, r.b.d2)
        for r in pq_codes(spark, sf_dir).collect()
    }
    rows = sorted(
        (r.vec_id, [float(x) for x in r.embedding])
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [vid for vid, _ in rows]
    x = np.array([emb for _, emb in rows], dtype=np.float64)
    sample = sorted(
        ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:_PQ_KS]
    pos = {vid: i for i, vid in enumerate(ids)}
    cent = x[[pos[v] for v in sample]]
    n_checked = 0
    for m in range(_PQ_M):
        sl = slice(m * _PQ_SUB, (m + 1) * _PQ_SUB)
        d2 = ((x[:, None, sl] - cent[None, :, sl]) ** 2).sum(axis=2)
        for i, vid in enumerate(ids):
            # lexicographic (d2, k) argmin — the struct-min tie-break
            want_k = min(zip(d2[i], sample))[1]
            k_got, d2_got = got[(vid, m)]
            assert k_got == want_k, (vid, m)
            assert abs(d2_got - d2[i][sample.index(want_k)]) < 1e-9
            n_checked += 1
    assert n_checked == len(ids) * _PQ_M


def test_sign_sum_bands_edge_cases_both_widths():
    """The shared sign-sum core (r13 refactor) against a literal
    pure-Python majority vote on CONSTRUCTED inputs the fixture never
    exercises: None rows, empty rows (leading/trailing/interior — the
    reduceat offset quirks its comments warn about), single-token
    rows, and hashes with the int64 sign bit set. Both band widths."""
    import numpy as np
    import pandas as pd

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
        _SIMHASH_BANDS,
        _sign_sum_bands,
    )

    rows = [
        None,                                   # null token array
        [],                                     # leading empty
        [2**63 - 1],                            # max positive
        [-(2**63), -1, 5],                      # sign bit + all-ones
        [],                                     # interior empty
        [7, 7, 7],                              # repeated values
        [0],                                    # zero hash
        [1, 2, 4, 8, 16],
        [],                                     # trailing empty
    ]
    rng = np.random.RandomState(7)
    n_fam = 4
    fams = []
    for f in range(n_fam):
        fam = []
        for r in rows:
            if r is None:
                fam.append(None)
            else:
                # vary per family deterministically, keep lengths equal
                fam.append([
                    int(rng.randint(-(2**62), 2**62)) if f > 0 else v
                    for v in r
                ])
        fams.append(pd.Series(fam, dtype=object))

    def reference(families, band_width):
        nrows = len(families[0])
        out = [[0] * _SIMHASH_BANDS for _ in range(nrows)]
        for row_i in range(nrows):
            arrs = [fam[row_i] for fam in families]
            if arrs[0] is None or len(arrs[0]) == 0:
                continue
            n = len(arrs[0])
            for wsel, arr in enumerate(arrs):
                for b in range(64):
                    ones = sum(1 for h in arr if (h >> b) & 1)
                    if 2 * ones > n:
                        j, i = divmod(wsel * 64 + b, band_width)
                        out[row_i][j] |= 1 << i
        # int64 two's-complement like the uint64→int64 view
        return [
            [w - 2**64 if w >= 2**63 else w for w in row] for row in out
        ]

    for families, width in ((fams[:2], 32), (fams, 64)):
        got = _sign_sum_bands(tuple(families), width)
        want = reference(families, width)
        assert got.tolist() == want, width
