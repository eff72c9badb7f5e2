package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** §5.2(3) invariants over the operators (fixture-data properties —
  * stronger than value snapshots because they must hold at any scale). */
class PropertySpec extends SparkSpec {

  test("lag deltas telescope: sum of deltas per user == last - first") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val e = Tables.events(spark, sf)
      .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
    val perUser = e.groupBy("user_id").agg(
      round(sum(col("delta")), 6).as("delta_sum"),
      round(max_by(col("value"), struct(col("ts"), col("event_id"))) -
            min_by(col("value"), struct(col("ts"), col("event_id"))), 6).as("span"))
    val bad = perUser.where(abs(col("delta_sum") - col("span")) > 1e-6).count()
    assert(bad == 0)
  }

  test("sessionize never splits a gap <= 30min or merges one > 30min") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = TimeSeries.qTsSessionize(spark, sf)
    // every session duration is consistent: n_events==1 => duration 0
    assert(sess.where(col("n_events") === 1 && col("duration_s") =!= 0.0).count() == 0)
    // session count per user == 1 + number of >30min gaps
    val gaps = Tables.events(spark, sf)
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .groupBy("user_id")
      .agg(sum(when(col("gap_us") > 1800L * 1000000L, 1).otherwise(0)).as("n_gaps"))
    val counted = sess.groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val joined = counted.join(gaps, "user_id")
      .where(col("n_sessions") =!= col("n_gaps") + 1)
    assert(joined.count() == 0)
  }

  test("dedup is idempotent and keeps one representative per hash") {
    val once = TextDedup.qDedupExact(spark, sf)
    assert(once.select("norm_hash").distinct().count() == once.count())
    assert(once.agg(sum("n_dups")).head.getLong(0) ==
           Tables.documents(spark, sf).count())
  }

  test("jaccard is symmetric-by-construction and self-sim is 1") {
    // pairs are emitted once with a_id < b_id — no (b, a) duplicates
    val pairs = TextDedup.qDedupJaccard(spark, sf)
    assert(pairs.where(col("a_id") >= col("b_id")).count() == 0)
    // cosine(v, v) == 1 for every vector (HOF math sanity)
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"),
        round(Vectors.cosine(
          transform(col("embedding"), x => x.cast("double")),
          transform(col("embedding"), x => x.cast("double"))), 6).as("self"))
    assert(e.where(abs(col("self") - 1.0) > 1e-6).count() == 0)
  }

  test("minhash-LSH recall >= 0.9 against the exact twin (SURVEY §7.2 M4)") {
    // The exact twin is q_dedup_jaccard: same lang, |Δchars| <= 25,
    // jaccard >= 0.6. The LSH op shares that blocking (on this corpus
    // ~59% of ALL doc pairs clear tau=0.6 unblocked — pair output without
    // metadata blocking is inherently O(n²) for any algorithm), so the
    // only recall loss allowed here is band-collision probability
    // (expected ~0.999 at 16 bands × 2 rows).
    val exact = TextDedup.qDedupJaccard(spark, sf).select("a_id", "b_id")
    val lsh = TextDedup.aDedupMinhash(spark, sf).select("a_id", "b_id")
    val nExact = exact.count()
    val nFound = exact.intersect(lsh).count()
    assert(nExact > 0, "fixture has no near-dup pairs at tau=0.6")
    val recall = nFound.toDouble / nExact
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 ($nFound/$nExact)")
  }

  test("bloom contamination screen: no false negatives vs the exact join; FP mass bounded") {
    // Bloom guarantee direction 1: every exact-contaminated test doc
    // appears in the screen with flagged >= its exact shared-gram
    // count (a Bloom can only ADD hits, never drop one).
    val exact = TextDedup.qTextContamination(spark, sf)
      .select(col("doc_id"), col("n_shared_grams"))
    val screen = TextDedup.aDedupBloomContam(spark, sf)
    val missed = exact.join(screen.select(col("doc_id"), col("n_flagged")),
        Seq("doc_id"), "left")
      .where(col("n_flagged").isNull || col("n_flagged") < col("n_shared_grams"))
      .count()
    assert(missed == 0, s"$missed exact-contaminated docs under-flagged by the screen")
    // Direction 2: the FP surplus stays within the sized-for rate —
    // 2^20 bits / 5 hashes over the fixture's train-gram cardinality
    // gives a sub-1% per-probe FP probability; allow 1% of all probes.
    val agg = screen.join(exact, Seq("doc_id"), "left")
      .agg(sum(col("n_flagged")).as("flagged"),
           sum(coalesce(col("n_shared_grams"), lit(0L))).as("shared"))
      .head()
    val totalProbes = screen.agg(sum(col("n_test_grams"))).head().getLong(0)
    val surplus = agg.getLong(0) - agg.getLong(1)
    assert(surplus <= totalProbes / 100 + 1,
      s"bloom FP surplus $surplus exceeds 1% of $totalProbes probes")
  }

  test("HLL rolling WAU within 5% of the exact rolling-distinct twin on every day") {
    val exact = TimeSeries.qTsWauRolling(spark, sf)
    val est = Aggregates.aAggHllRolling(spark, sf)
    val joined = exact.join(est, "window_day")
    assert(joined.count() == exact.count(),
      "sketch series must cover every exact window day")
    val bad = joined
      .where(abs(col("wau_est").cast("double") - col("wau")) >
             col("wau").cast("double") * 0.05)
      .count()
    assert(bad == 0, s"$bad window days beyond 5% HLL error")
  }

  test("SRP-ANN recall >= 0.8 against the exact embed-dedup twin") {
    val exact = Vectors.qDedupEmbed(spark, sf).select("a_id", "b_id")
    val ann = Vectors.aSimAnnLsh(spark, sf).select("a_id", "b_id")
    val nExact = exact.count()
    assert(nExact > 0, "fixture has no embedding near-dup pairs at tau=0.4")
    val recall = exact.intersect(ann).count().toDouble / nExact
    assert(recall >= 0.8, s"SRP-LSH recall $recall < 0.8")
    // precision is 1.0 by construction (exact cosine verification) —
    // every ANN pair must be in the exact set
    assert(ann.except(exact).count() == 0)
  }

  test("chunking: exact cover, stride-aligned, every chunk adds new tokens") {
    // the closed-form chunk count (1 + (n-17) div 48 past 64) must
    // produce, for EVERY fixture doc: chunk_ids contiguous from 0,
    // starts on the 48 grid, last chunk ending exactly at n, all
    // chunks <= 64 tokens, and (except chunk 0) each chunk's tail
    // extending past the previous chunk's end - 16 overlap
    val n = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = TextAnalysis.qTextChunk(spark, sf)
      .select("doc_id", "chunk_id", "chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(chunks.keySet == n.keySet, "every doc must chunk")
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq,
             s"doc $doc: chunk_ids not contiguous")
      sorted.foreach { case (_, id, tok) =>
        assert(tok >= 1 && tok <= 64, s"doc $doc chunk $id: $tok tokens")
        assert(48 * id + tok <= n(doc), s"doc $doc chunk $id overruns")
      }
      val (_, lastId, lastTok) = sorted.last
      assert(48 * lastId + lastTok == n(doc),
             s"doc $doc: cover ends at ${48 * lastId + lastTok}, n=${n(doc)}")
      // every non-first chunk must add tokens beyond the previous cover
      sorted.drop(1).foreach { case (_, id, tok) =>
        val prevEnd = math.min(48 * (id - 1) + 64, n(doc))
        assert(48 * id + tok > prevEnd,
               s"doc $doc chunk $id is fully contained in its predecessor")
      }
    }
  }

  test("semantic dedup (SemDeDup): precision 1.0, recall >= 0.9, deterministic") {
    val exact = Vectors.qDedupEmbed(spark, sf)
    val victims = exact.select(col("b_id").as("vec_id")).distinct()
    val nV = victims.count()
    assert(nV > 0, "fixture has no embedding near-dup victims at tau=0.4")
    val drops = Vectors.aDedupSemantic(spark, sf)
    // precision 1.0 by construction: every (kept_for, vec_id) drop is a
    // verified exact in-cluster cosine pair
    assert(drops.select(col("kept_for").as("a_id"), col("vec_id").as("b_id"))
      .except(exact.select("a_id", "b_id")).count() == 0,
      "a dropped pair is not an exact near-dup pair")
    // recall: a miss = the pair straddled all 4 probed cells
    val rec = victims.intersect(drops.select("vec_id")).count().toDouble / nV
    assert(rec >= 0.9, s"semantic-dedup victim recall $rec < 0.9")
    // deterministic: Lloyd from the fixed lowest-id seed, no RNG
    assert(drops.except(Vectors.aDedupSemantic(spark, sf)).count() == 0)
  }

  test("semantic dedup routed two-level quantizer (forced): precision 1.0, recall >= 0.9, parity vs flat, deterministic") {
    // the routed path only engages past flatMaxK = 1024 cells
    // (n > 256k vectors) in production — force it onto the fixture
    // with a raised cell count (clusterTarget=8 → k=62, √k=8 groups)
    // and routeProbes=3 so routing REALLY prunes (3 of 8 groups —
    // default-capped probes would visit every group at this scale and
    // trivially equal flat). Bounds: precision 1.0 by construction
    // (every drop exact-cosine-verified), victim recall >= 0.9 vs the
    // exact twin, drop-count parity within 1% of the FLAT path at the
    // same k (the codebook is bit-identical — divergence is routing
    // misses only), and bit-stable reruns (fixed seeds + fixed-point
    // recentering, no RNG anywhere).
    val exact = Vectors.qDedupEmbed(spark, sf)
    val victims = exact.select(col("b_id").as("vec_id")).distinct()
    val nV = victims.count()
    // Part 1 — production-shaped knobs (default clusterTarget), routed
    // path forced with EXHAUSTIVE routing (default routeProbes >= all
    // groups at this k): the routed kernel visits every cell, so its
    // selection must be BIT-EQUAL to the flat kernel's (same centroid
    // arrays, same dot order, same lowest-id tie rule) — drops
    // row-identical to the flat path, which carries the 0.9 recall
    // floor already pinned above. A kernel bug (wrong member wiring,
    // tie-rule drift) fails as a row diff here, not as a fuzzy bound.
    val flatDefault = Vectors.aDedupSemantic(spark, sf)
    spark.conf.set("graft.semantic.flatMaxK", "1")
    try {
      val routedAll = Vectors.aDedupSemantic(spark, sf)
      assert(routedAll.except(flatDefault).count() == 0 &&
             flatDefault.except(routedAll).count() == 0,
        "exhaustive routing must reproduce the flat assignment bit-exactly")
      // Part 2 — REAL pruning (k raised so √k groups exist, 3 of 8
      // probed): precision stays 1.0 by construction, drops stay
      // near-parity with the flat path at the SAME k (the codebook is
      // bit-identical — divergence is routing misses only), reruns
      // bit-stable. The production-scale parity number (±0.1%) is the
      // measured sf10/sf100 ladder's, not the 50-drop fixture's.
      spark.conf.set("graft.semantic.clusterTarget", "8")
      spark.conf.unset("graft.semantic.flatMaxK")
      val flatK = Vectors.aDedupSemantic(spark, sf).count()
      spark.conf.set("graft.semantic.flatMaxK", "1")
      spark.conf.set("graft.semantic.routeProbes", "3")
      val drops = Vectors.aDedupSemantic(spark, sf)
      assert(drops.select(col("kept_for").as("a_id"), col("vec_id").as("b_id"))
        .except(exact.select("a_id", "b_id")).count() == 0,
        "a routed-path drop is not an exact near-dup pair")
      val nDrops = drops.count()
      assert(math.abs(nDrops - flatK).toDouble / flatK <= 0.1,
        s"routed drop count $nDrops vs flat-at-same-k $flatK exceeds 10% fixture parity")
      assert(drops.except(Vectors.aDedupSemantic(spark, sf)).count() == 0)
      assert(nV > 0) // fixture sanity (victims feed the flat test above)
    } finally {
      spark.conf.unset("graft.semantic.clusterTarget")
      spark.conf.unset("graft.semantic.flatMaxK")
      spark.conf.unset("graft.semantic.routeProbes")
    }
  }

  test("k-means seeding is rank-based: sparse id space seeds exactly k and drops are id-transform-identical") {
    // vec_id → vec_id·7+3 (order-preserving, NON-contiguous — the
    // post-dedup re-ingest / sharded-id shape): under the retired
    // `vec_id < k` seed filter this frame silently seeded ~k/7 cells;
    // the min-k rank rule (distributed TakeOrdered) must seed exactly
    // k. And because every downstream rule (cell assignment, keeper =
    // min a_id, tie orders) depends on id ORDER only — which ·7+3
    // preserves — the semantic-dedup drop set must be the fixture's
    // under the same transform, row for row (round-11 verdict ask #3).
    val dir = java.nio.file.Files.createTempDirectory("graft_sparse_ids").toString
    Tables.embeddings(spark, sf)
      .withColumn("vec_id", col("vec_id") * 7 + 3)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // PIN trainFrac = 1: the drop-set invariance below holds only when
    // sample-training is OFF — the trainer's md5(vec_id) sample filter
    // is (by design) NOT invariant under vec_id → 7·id + 3, so with
    // trainPerCell·k < n the two runs would legitimately train on
    // different subsets and diverge for reasons unrelated to seeding.
    // The fixture satisfies 64·k ≥ n today; the pin keeps the test
    // meaning "seeding is rank-based" if the fixture ever grows.
    spark.conf.set("graft.semantic.trainPerCell", Long.MaxValue.toString)
    try {
      val k = 32
      val seeds = Vectors.kmeansCentroids(spark, dir, k, iters = 1)
      assert(seeds.length == k, s"sparse id space must seed exactly $k cells")
      val base = Vectors.aDedupSemantic(spark, sf)
        .select((col("vec_id") * 7 + 3).as("vec_id"),
                (col("kept_for") * 7 + 3).as("kept_for"),
                col("max_sim"), col("n_dup_of"))
      val sparse = Vectors.aDedupSemantic(spark, dir)
        .select(col("vec_id"), col("kept_for"), col("max_sim"), col("n_dup_of"))
      assert(sparse.except(base).count() == 0 && base.except(sparse).count() == 0,
        "semantic drops must be identical modulo the id transform")
    } finally spark.conf.unset("graft.semantic.trainPerCell")
  }

  test("semantic dedup DISTRIBUTED codebook (forced): exhaustive = flat bit-exact, pruned parity, precision 1.0, deterministic") {
    // the distributed-codebook path only engages past driverMaxK =
    // 131072 cells (n > 32M vectors) in production — force it onto the
    // fixture. Part 1 probes EVERY group: seeding (min-k rank),
    // fixed-point recentering, left-fold normalization, and the
    // (dot strict-greater, lowest-cell-on-ties) selection all mirror
    // the flat path bit-for-bit, and exhaustive routing visits every
    // cell through the slab join — so drops must be ROW-IDENTICAL to
    // the flat path's. Seed-rule drift, slab mis-wiring, or a merge
    // tie-rule bug fails as a row diff here, not as a fuzzy bound.
    val exact = Vectors.qDedupEmbed(spark, sf)
    val flatDefault = Vectors.aDedupSemantic(spark, sf)
    try {
      spark.conf.set("graft.semantic.flatMaxK", "1")
      spark.conf.set("graft.semantic.driverMaxK", "1")
      spark.conf.set("graft.semantic.routeProbes", "999")
      val distAll = Vectors.aDedupSemantic(spark, sf)
      assert(distAll.except(flatDefault).count() == 0 &&
             flatDefault.except(distAll).count() == 0,
        "exhaustive distributed codebook must reproduce the flat drops bit-exactly")
      // Part 2 — REAL pruning (clusterTarget=8 → √k groups, 3 probed):
      // precision 1.0 by construction (every drop exact-cosine
      // verified), drop-count parity within 10% of the flat path at
      // the same k (divergence = routing misses under the distributed
      // group geometry), reruns bit-stable. The production parity
      // number (±0.1%) is the measured sf100 ladder's.
      spark.conf.set("graft.semantic.clusterTarget", "8")
      spark.conf.unset("graft.semantic.driverMaxK")
      spark.conf.unset("graft.semantic.flatMaxK")
      spark.conf.unset("graft.semantic.routeProbes")
      val flatK = Vectors.aDedupSemantic(spark, sf).count()
      spark.conf.set("graft.semantic.flatMaxK", "1")
      spark.conf.set("graft.semantic.driverMaxK", "1")
      spark.conf.set("graft.semantic.routeProbes", "3")
      val drops = Vectors.aDedupSemantic(spark, sf)
      assert(drops.select(col("kept_for").as("a_id"), col("vec_id").as("b_id"))
        .except(exact.select("a_id", "b_id")).count() == 0,
        "a distributed-path drop is not an exact near-dup pair")
      val nDrops = drops.count()
      assert(math.abs(nDrops - flatK).toDouble / flatK <= 0.1,
        s"distributed drop count $nDrops vs flat-at-same-k $flatK exceeds 10% fixture parity")
      assert(drops.except(Vectors.aDedupSemantic(spark, sf)).count() == 0)
    } finally {
      spark.conf.unset("graft.semantic.clusterTarget")
      spark.conf.unset("graft.semantic.flatMaxK")
      spark.conf.unset("graft.semantic.driverMaxK")
      spark.conf.unset("graft.semantic.routeProbes")
    }
  }

  test("IVF-ANN recall >= 0.8 against the exact embed-dedup twin") {
    val exact = Vectors.qDedupEmbed(spark, sf).select("a_id", "b_id")
    val ivf = Vectors.aSimAnnIvf(spark, sf).select("a_id", "b_id")
    val nExact = exact.count()
    assert(nExact > 0, "fixture has no embedding near-dup pairs at tau=0.4")
    val recall = exact.intersect(ivf).count().toDouble / nExact
    assert(recall >= 0.8, s"IVF recall $recall < 0.8")
    // precision 1.0 by construction (exact cosine verification)
    assert(ivf.except(exact).count() == 0)
  }

  test("ANN packed-lookup verify rung (forced): bit-identical to the broadcast-join verify") {
    // rung 2 of the ANN verify ladder (graft_packed_cos against the
    // float-packed broadcast store) only engages past the join-verify
    // byte gate — force it onto the fixture and require the EXACT same
    // (a_id, b_id, sim) rows as the default path: embeddings are
    // float32 and the packed kernel widens elements to double exactly
    // like the join path's DotProduct, so this is bit-equality, not a
    // tolerance test.
    val lshDefault = Vectors.aSimAnnLsh(spark, sf).collect().toSeq
    val ivfDefault = Vectors.aSimAnnIvf(spark, sf).collect().toSeq
    val semDefault = Vectors.aDedupSemantic(spark, sf).collect().toSeq
    spark.conf.set("graft.lsh.verifyBroadcastBytes", "0")
    spark.conf.set("graft.ann.verifyBroadcastBytes", "0")
    try {
      val lshPacked = Vectors.aSimAnnLsh(spark, sf).collect().toSeq
      assert(lshPacked == lshDefault,
             "LSH packed-lookup verify diverged from the broadcast-join verify")
      val ivfPacked = Vectors.aSimAnnIvf(spark, sf).collect().toSeq
      assert(ivfPacked == ivfDefault,
             "IVF packed-lookup verify diverged from the join verify")
      // round-11: the slimmed semantic-dedup exchange rides the same
      // rung ladder — its drops must be bit-equal on the packed rung
      val semPacked = Vectors.aDedupSemantic(spark, sf).collect().toSeq
      assert(semPacked == semDefault,
             "semantic-dedup packed-lookup verify diverged from the join verify")
    } finally {
      spark.conf.unset("graft.lsh.verifyBroadcastBytes")
      spark.conf.unset("graft.ann.verifyBroadcastBytes")
    }
  }

  test("IVF product-quantizer branch (forced onto the fixture): precision 1.0, candidates sane") {
    // the inverted-multi-index branch only engages above 32k vectors in
    // production — force it here so the ≥sf10 code path is tested at
    // fixture scale. With 500 vectors over 16,384 product cells the
    // occupancy is ~0 so recall is NOT asserted (that regime belongs to
    // the flat index, which the gate keeps at this n); the invariants
    // that must hold on ANY input: every emitted pair really clears
    // τ=0.4 (exact verification — precision 1.0) and the op runs clean
    // end to end.
    spark.conf.set("graft.ivf.flatMax", "100")
    try {
      val exact = Vectors.qDedupEmbed(spark, sf).select("a_id", "b_id")
      val imi = Vectors.aSimAnnIvf(spark, sf).select("a_id", "b_id")
      assert(imi.except(exact).count() == 0,
             "product-quantizer path emitted a pair the exact twin rejects")
    } finally spark.conf.unset("graft.ivf.flatMax")
    // and with the gate back at its default the flat path still plans
    assert(Vectors.aSimAnnIvf(spark, sf).limit(1).count() >= 0)
  }

  test("IVF-PQ top-10 recall >= 0.5 vs the exact brute-force twin; shortlist re-rank is exact") {
    val exact = Vectors.qSimSearchTopk(spark, sf)
      .where(org.apache.spark.sql.functions.col("vec_id") =!= 0)
      .collect().map(_.getLong(0)).take(10).toSet
    val got = Vectors.aSimAnnIvfPq(spark, sf).collect()
    assert(got.length == 10, s"IVF-PQ must return exactly 10 neighbors, got ${got.length}")
    // sims come from the EXACT re-rank, so they must be true cosines
    // in descending order
    val sims = got.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    val recall = got.map(_.getLong(0)).count(exact.contains).toDouble / exact.size
    // two stacked approximations (IVF routing + PQ shortlist) on the
    // fixture's near-random vectors — the worst case for both; the
    // exact re-rank keeps reported sims truthful even when the
    // shortlist misses a true neighbor
    assert(recall >= 0.5, s"IVF-PQ recall@10 $recall < 0.5")
  }

  test("dedup clusters are consistent with the pair graph") {
    // every paired doc is clustered with its partner; cluster_id is the
    // component min; sizes agree with the membership rows
    val pairs = TextDedup.qDedupJaccard(spark, sf).select("a_id", "b_id")
    val clusters = TextDedup.qDedupCluster(spark, sf)
    val lab = clusters.select(col("doc_id"), col("cluster_id"))
    val viaA = pairs.join(lab.withColumnRenamed("doc_id", "a_id"), "a_id")
      .withColumnRenamed("cluster_id", "ca")
      .join(lab.withColumnRenamed("doc_id", "b_id"), "b_id")
      .withColumnRenamed("cluster_id", "cb")
    assert(viaA.where(col("ca") =!= col("cb")).count() == 0,
           "paired docs landed in different clusters")
    assert(clusters.where(col("cluster_id") > col("doc_id")).count() == 0,
           "cluster_id must be the component minimum")
    val sizeCheck = clusters.groupBy(col("cluster_id"), col("cluster_size"))
      .count().where(col("count") =!= col("cluster_size"))
    assert(sizeCheck.count() == 0, "cluster_size disagrees with membership")
  }

  test("simhash pairs all verify hamming <= 3 and the op finds pairs") {
    val sh = TextDedup.aDedupSimhash(spark, sf)
    assert(sh.where(col("hamming") > 3).count() == 0)
    assert(sh.count() > 0, "dup-heavy fixture should contain simhash pairs")
  }

  test("count-min sketch never undercounts and stays within eps*N overhead") {
    val truth = Tables.events(spark, sf)
      .groupBy(col("user_id").cast("string").as("user_id"))
      .count()
    val n = Tables.events(spark, sf).count()
    val slack = math.max(2L, (0.001 * n * 5).toLong) // 5x the per-query eps*N bound (prob. guarantee)
    val joined = Aggregates.aAggCms(spark, sf)
      .join(truth, "user_id")
      .select(col("user_id"), col("est"), col("count")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted ${r.getString(0)}: $est < $exact")
      assert(est - exact <= slack,
             s"CMS overcount for ${r.getString(0)} beyond bound: $est vs $exact")
    }
  }

  test("SpaceSaving sketch honors its bounds: est >= true, error <= N/capacity") {
    val truth = Tables.events(spark, sf)
      .groupBy(col("user_id").cast("string").as("user_id"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val capacity = 64L
    val sketch = Aggregates.aAggTopkSketch(spark, sf).collect()
    assert(sketch.nonEmpty && sketch.length <= 10)
    sketch.foreach { r =>
      val (item, est) = (r.getString(0), r.getLong(1))
      val exact = truth.getOrElse(item, 0L)
      assert(est >= exact, s"sketch underestimated $item: $est < $exact")
      assert(est - exact <= n / capacity,
             s"sketch error for $item exceeds N/capacity: $est vs $exact (N=$n)")
    }
  }

  test("HLL approx distinct is within rsd bounds of the exact per-day counts") {
    // approx_count_distinct's default rsd is 0.05; HLL's error is
    // probabilistic (rsd = one standard deviation), so bound at 5 sigma
    // — a deterministic fixture either passes forever or never.
    val exact = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val approx = Aggregates.aAggApproxDistinct(spark, sf)
    val joined = approx.join(exact, "day")
    assert(joined.count() > 0)
    val bad = joined.where(
      abs(col("approx_users") - col("exact_users")) >
      greatest(col("exact_users") * 0.25, lit(2.0))).count()
    assert(bad == 0, "HLL estimate deviated > 5x rsd from exact distinct count")
  }

  test("funnel stage counts are monotonically non-increasing") {
    val rows = graft.ops.TimeSeries.qTsFunnel(spark, sf)
      .orderBy("stage").collect().map(_.getLong(1))
    assert(rows.length == 4 && rows.sliding(2).forall(p => p(0) >= p(1)),
           s"funnel must narrow stage over stage: ${rows.toSeq}")
  }

  test("histogram buckets conserve total mass and cum ends at the total") {
    import org.apache.spark.sql.functions._
    val h = graft.ops.Aggregates.qAggHistogram(spark, sf)
    val total = Tables.events(spark, sf).count()
    assert(h.agg(sum("n_events")).head.getLong(0) == total)
    val lastCum = h.groupBy("event_type")
      .agg(max(col("cum_events")).as("c"), sum(col("n_events")).as("s"))
      .where(col("c") =!= col("s")).count()
    assert(lastCum == 0, "per-type cumulative must end at the per-type total")
  }

  test("stratified sample hits EXACTLY ceil(10%) per language") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.TextAnalysis.qSampleStratified(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("k"))
    val want = Tables.documents(spark, sf)
      .groupBy("lang").agg(ceil(count(lit(1)) / 10.0).as("q"))
    val bad = got.join(want, "lang").where(col("k") =!= col("q")).count()
    assert(bad == 0, "per-stratum quota must be exact, not in-expectation")
  }

  test("uptime is bounded (0, 100] and active hours never exceed the span") {
    import org.apache.spark.sql.functions._
    val u = graft.ops.TimeSeries.qTsUptime(spark, sf)
    val bad = u.where(col("uptime_pct") <= 0 || col("uptime_pct") > 100.0 ||
                      col("n_active_hours") > col("span_hours")).count()
    assert(bad == 0, "uptime must be a valid coverage fraction")
  }

  test("heatmap conserves total event mass over the 7x24 grid") {
    import org.apache.spark.sql.functions._
    val total = graft.ops.TimeSeries.qTsHeatmap(spark, sf)
      .agg(sum("n")).head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("cumsum's last row per user equals the user's exact total") {
    import org.apache.spark.sql.functions._
    val cs = graft.ops.Windows.qWinCumsum(spark, sf)
    // values are strictly positive, so the running total is strictly
    // increasing and its max IS the final row (event_id order need not
    // match time order, so max_by(event_id) would be wrong in general)
    val lastPerUser = cs.groupBy("user_id")
      .agg(max(col("running_total")).as("final"))
    val truth = Tables.events(spark, sf).groupBy("user_id")
      .agg(graft.ops.Util.dsum(col("value")).as("tot"))
    val bad = lastPerUser.join(truth, "user_id")
      .where(col("final") =!= col("tot")).count()
    assert(bad == 0, "running total must telescope to the exact user total")
  }

  test("sequence packing: contiguous exact cover, straddle math, sparse-id two-level prefix") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val p = graft.ops.TextAnalysis.qPipelinePack(spark, sf).cache()
    // exact cover: placements tile the concatenated token stream with no
    // gap and no overlap — next doc starts where the previous one ended
    val w = Window.orderBy("doc_id")
    val bad = p.withColumn("prev_end",
        lag(col("start_pos") + col("n_tokens"), 1, 0L).over(w))
      .where(col("start_pos") =!= col("prev_end")).count()
    assert(bad == 0, "doc placements must be contiguous in doc_id order")
    val total = p.agg(sum("n_tokens")).head.getLong(0)
    val lastEnd = p.agg(max(col("start_pos") + col("n_tokens"))).head.getLong(0)
    assert(total == lastEnd, "token stream length must equal the token sum")
    // straddle math: n_seqs is exactly the number of 256-token blocks
    // the doc's [start, end] span touches
    val badSeq = p.where(col("n_seqs") =!=
      ((col("start_pos") + col("n_tokens") - 1) / 256).cast("long")
        - (col("start_pos") / 256).cast("long") + 1).count()
    assert(badSeq == 0, "n_seqs must count touched blocks")
    // sparse ids (doc_id × 7 + 3): the div-1024 sharding makes copies
    // land in DIFFERENT shards, yet the two-level prefix must still
    // telescope — same contiguity invariant on a gappy id space
    val sparse = Tables.documents(spark, sf)
      .withColumn("doc_id", col("doc_id") * 7 + 3)
    val shards = p.select((col("doc_id") / 1024).cast("long")).distinct.count()
    val sp = {
      // the operator's own two-level arithmetic, applied to the sparse
      // frame (the operator reads the fixture table, so inline the body)
      val docs = sparse.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("shard", expr("doc_id div 1024"))
      val wSh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
      val offsets = docs.groupBy("shard").agg(sum(col("n_tokens")).as("st"))
        .withColumn("off", coalesce(sum(col("st")).over(wSh), lit(0L)))
        .select("shard", "off")
      val wIn = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.join(broadcast(offsets), "shard")
        .withColumn("start_pos",
          col("off") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
    }
    val spBad = sp.withColumn("prev_end",
        lag(col("start_pos") + col("n_tokens"), 1, 0L).over(Window.orderBy("doc_id")))
      .where(col("start_pos") =!= col("prev_end")).count()
    assert(spBad == 0, "two-level prefix must telescope on a sparse id space")
    assert(sp.select(col("shard")).distinct.count() > shards,
      "sparse ids must actually exercise multiple shards")
    p.unpersist(); ()
  }

  test("curate pipeline gate counts telescope to the doc count") {
    import org.apache.spark.sql.functions._
    val p = graft.ops.TextDedup.qPipelineCurate(spark, sf)
    val bad = p.where(col("n_docs") =!=
      col("n_exact_dup") + col("n_near_dup") + col("n_quality_fail") + col("n_kept"))
      .count()
    assert(bad == 0, "every doc must land in exactly one gate bucket")
    val total = p.agg(sum("n_docs")).head.getLong(0)
    assert(total == Tables.documents(spark, sf).count(),
           "pipeline must account for every document")
  }

  test("HLL partial-sketch rollup matches exact per-type distincts within rsd") {
    // lgConfigK=12 -> rsd ~1.6%; allow 5% (or 2 absolute) like the
    // per-day HLL test. The point under test is MERGEABILITY: the
    // per-day partials unioned per type must estimate the same set as
    // a direct distinct over the raw rows.
    import org.apache.spark.sql.functions._
    val est = graft.ops.Aggregates.aAggHllPartial(spark, sf)
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val bad = est.join(exact, "event_type")
      .where(abs(col("est_users") - col("exact_users")) >
        greatest(col("exact_users") * 0.05, lit(2.0))).count()
    assert(bad == 0, "merged HLL estimate deviated >5% from exact distinct")
  }

  test("HLL inclusion-exclusion intersections match exact overlaps within bounds") {
    // est(A∩B) = est(A)+est(B)−est(A∪B) compounds three ~1.6%-rsd
    // estimates, so the bound is looser than the single-sketch tests:
    // 15% of the exact overlap or 5 absolute, whichever is larger.
    import org.apache.spark.sql.functions._
    val est = graft.ops.Aggregates.aAggHllIntersect(spark, sf)
    val tu = Tables.events(spark, sf)
      .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
    val exact = tu.alias("x")
      .join(tu.alias("y"), col("x.u") === col("y.u") && col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("type_a"), col("y.t").as("type_b"))
      .agg(countDistinct(col("x.u")).as("exact_i"))
    val joined = est.join(exact, Seq("type_a", "type_b"))
    assert(joined.count() == est.count(), "every pair must have an exact twin row")
    val bad = joined.where(abs(col("est_intersect") - col("exact_i")) >
      greatest(col("exact_i") * 0.15, lit(5.0))).count()
    assert(bad == 0, "inclusion-exclusion estimate deviated beyond the compound bound")
  }

  test("kmeans: full coverage, and 3 Lloyd rounds improve the spherical objective") {
    def objective(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val rows = df.collect()
      val n = rows.map(_.getAs[Long]("n_members")).sum
      val obj = rows.map(r => r.getAs[Long]("n_members") * r.getAs[Double]("avg_sim")).sum
      (n, obj)
    }
    val nVecs = Tables.embeddings(spark, sf).count()
    val (n3, obj3) = objective(graft.ops.Vectors.kmeans(spark, sf, 8, 3))
    assert(n3 == nVecs, "every vector must be assigned to exactly one cluster")
    val (n0, obj0) = objective(graft.ops.Vectors.kmeans(spark, sf, 8, 0))
    assert(n0 == nVecs)
    // Lloyd never decreases Σ cos(x, centroid); allow rounding slack
    assert(obj3 >= obj0 - 1e-6 * nVecs,
           s"3-round objective $obj3 worse than seed objective $obj0")
    // sims are cosines of unit-normalized pairs
    graft.ops.Vectors.aEmbedKmeans(spark, sf).collect().foreach { r =>
      val s = r.getAs[Double]("avg_sim")
      assert(s >= -1.0001 && s <= 1.0001, s"avg_sim $s outside cosine range")
    }
  }

  test("product quantization: code range, subspace coverage, beats the 1-centroid baseline") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Vectors.aEmbedPq(spark, sf).collect()
    assert(out.nonEmpty)
    // codes in [0, 16), all 8 subspaces present, memberships total n×8
    out.foreach { r =>
      assert(r.getAs[Int]("code") >= 0 && r.getAs[Int]("code") < 16)
      assert(r.getAs[Double]("mse") >= 0.0)
    }
    assert(out.map(_.getAs[Int]("sub")).toSet == (0 until 8).toSet,
           "every subspace must have at least one populated code")
    val nVecs = Tables.embeddings(spark, sf).count()
    val bySub = out.groupBy(_.getAs[Int]("sub"))
    bySub.foreach { case (sub, rows) =>
      assert(rows.map(_.getAs[Long]("n_members")).sum == nVecs,
             s"subspace $sub must assign every vector exactly once")
    }
    // 16 trained centroids must strictly beat ONE centroid (the
    // global mean): per subspace, weighted PQ MSE < Σ_p var(x_p)
    val varBySub = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select((col("pos") / 8).cast("int").as("sub"), col("x").cast("double").as("x"),
              col("pos"))
      .groupBy(col("sub"), col("pos"))
      .agg(variance(col("x")).as("v"))
      .groupBy(col("sub")).agg(sum(col("v")).as("sv"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    bySub.foreach { case (sub, rows) =>
      val n = rows.map(_.getAs[Long]("n_members")).sum.toDouble
      val mse = rows.map(r => r.getAs[Long]("n_members") * r.getAs[Double]("mse")).sum / n
      assert(mse < varBySub(sub),
             s"subspace $sub: PQ MSE $mse must beat 1-centroid baseline ${varBySub(sub)}")
    }
  }

  test("quantile sketch: merged-partial estimates honor the GK rank bound; SQL surface") {
    import org.apache.spark.sql.functions._
    val eps = 0.01 // relErr used by aAggQuantilePartial
    val est = graft.ops.Aggregates.aAggQuantilePartial(spark, sf).collect()
    assert(est.nonEmpty)
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted }
    est.foreach { r =>
      val vals = byType(r.getString(0))
      val n = vals.length
      for ((phi, i) <- Seq(0.5 -> 1, 0.95 -> 2, 0.99 -> 3)) {
        val v = r.getDouble(i)
        // GK guarantee: the estimate's true rank is within ε·N of φ·N
        // (±1 for the discrete rank cut)
        val rank = vals.count(_ <= v)
        assert(math.abs(rank - phi * n) <= eps * n + 1,
          s"type=${r.getString(0)} phi=$phi est=$v rank=$rank n=$n")
        // and the estimate is an actual observed value (GK returns
        // sampled inputs, never interpolations)
        assert(vals.contains(v), s"estimate $v not an observed value")
      }
    }
    // the per-day partial path must agree with a single global sketch
    // within the additive bound (merge does not degrade the guarantee)
    Tables.events(spark, sf).createOrReplaceTempView("events_q")
    val viaSql = spark.sql(
      """SELECT graft_quantile_query(graft_quantile_agg(value, 0.01D), 0.5D) AS p50
         FROM events_q""").head.getDouble(0)
    val n = byType.values.map(_.length).sum
    val all = byType.values.flatten.toArray.sorted
    val rank = all.count(_ <= viaSql)
    assert(math.abs(rank - 0.5 * n) <= eps * n + 1, "SQL surface violates the bound")
  }

  test("bitmap distinct: blob roundtrip dense+sparse, rollup == countDistinct, SQL surface") {
    import org.apache.spark.sql.functions._
    import graft.functions.BitmapUtil
    // dense container (0..65535 full) + second container + far sparse one
    val bm = BitmapUtil.empty
    (0L until 70000L).foreach(BitmapUtil.add(bm, _))
    BitmapUtil.add(bm, 1L << 40)
    assert(BitmapUtil.count(bm) == 70001L)
    assert(BitmapUtil.count(BitmapUtil.deser(BitmapUtil.ser(bm))) == 70001L)
    assert(BitmapUtil.countBlob(BitmapUtil.ser(bm)) == 70001L)
    // sparse∪sparse overflow converts to dense WITHOUT losing the
    // overflow element (4500 union entries > SparseMax)
    val sa = BitmapUtil.empty
    (0L until 2500L).foreach(BitmapUtil.add(sa, _))
    val sb = BitmapUtil.empty
    (2000L until 4500L).foreach(BitmapUtil.add(sb, _))
    BitmapUtil.or(sa, sb)
    assert(BitmapUtil.count(sa) == 4500L, "sparse-merge overflow lost keys")
    assert(BitmapUtil.countBlob(BitmapUtil.ser(sa)) == 4500L)
    // scattered key domain (one key per container — the hashed-id
    // shape): memory AND wire stay O(keys), never 8 KB per prefix
    val sc = BitmapUtil.empty
    (0L until 10000L).foreach(k => BitmapUtil.add(sc, k << 16))
    assert(BitmapUtil.count(sc) == 10000L)
    assert(BitmapUtil.ser(sc).length < 10000 * 16,
           "scattered keys must serialize ~15 B/key, not a dense container each")
    // or() must COPY the other side's containers, never alias them
    val src = BitmapUtil.empty
    BitmapUtil.add(src, 7L)
    val dst = BitmapUtil.empty
    BitmapUtil.or(dst, src)
    BitmapUtil.add(src, 8L)
    assert(BitmapUtil.count(dst) == 1L, "or() aliased the source container")
    // the graded rollup (daily partials OR-merged) must be EXACT
    val est = graft.ops.Aggregates.qAggBitmapDistinct(spark, sf)
    val exact = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("x"))
    assert(est.join(exact, "event_type").where(col("n_users") =!= col("x")).count() == 0,
           "bitmap rollup must equal the direct distinct count")
    // SQL-registered surface agrees
    Tables.events(spark, sf).createOrReplaceTempView("events")
    val viaSql = spark.sql(
      "SELECT graft_bitmap_count(graft_bitmap_agg(user_id)) AS n FROM events")
      .head.getLong(0)
    val direct = Tables.events(spark, sf).select(countDistinct(col("user_id")))
      .head.getLong(0)
    assert(viaSql == direct)
  }

  test("z-order layout prunes day-window files a user-sorted layout cannot") {
    // The claim behind q_sink_zorder: with per-file min/max stats, a
    // range predicate on the NON-leading dimension skips files only if
    // the layout co-clusters both dimensions. User-sorted files each
    // span the whole month (every user is active all month), so ALL
    // overlap a 10-day window; the Morton layout leaves some files
    // with a constrained day range (simulated on this fixture: 9/16).
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val ev = Tables.events(spark, sf)
    ev.repartitionByRange(16, col("user_id"), col("ts"))
      .write.mode("overwrite").parquet(s"$tmp/lin")
    ev.withColumn("z", graft.ops.Util.morton(
        col("user_id"), expr("unix_micros(ts) div 86400000000")))
      .repartitionByRange(16, col("z")).sortWithinPartitions("z").drop("z")
      .write.mode("overwrite").parquet(s"$tmp/z")
    val loDay = 19723L + 10L; val hiDay = 19723L + 19L // Jan 11–20 as epoch days
    def overlapping(dir: String): Long =
      spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .withColumn("day", expr("unix_micros(ts) div 86400000000"))
        .groupBy("f").agg(min("day").as("lo"), max("day").as("hi"))
        .where(col("lo") <= hiDay && col("hi") >= loDay).count()
    val lin = overlapping(s"$tmp/lin"); val zo = overlapping(s"$tmp/z")
    assert(lin == 16, s"user-sorted layout should not prune day windows (got $lin)")
    assert(zo < lin, s"z-order must prune strictly more files ($zo vs $lin)")
  }

  test("a_embed_pca: unit PC1, eigenvalue == projection variance, residual small") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Vectors.aEmbedPca(spark, sf).collect()
      .sortBy(_.getInt(0))
    val v = out.map(_.getDouble(1))
    val lambda = out.head.getDouble(2)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-3, "PC1 must be unit-norm")
    // definitional twin: vᵀCv IS the population variance of projections
    val emb = Tables.embeddings(spark, sf).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray)
    val projs = emb.map(e => e.zip(v).map { case (a, b) => a.toDouble * b }.sum)
    val m = projs.sum / projs.length
    val varp = projs.map(p => (p - m) * (p - m)).sum / projs.length
    assert(math.abs(varp - lambda) <= 0.01 * lambda + 1e-6,
           s"projection variance $varp != reported eigenvalue $lambda")
    // PC1 must beat every single coordinate's variance (top-eigenvalue check)
    val dim = v.length
    val coordVar = (0 until dim).map { i =>
      val xs = emb.map(_(i).toDouble)
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }.max
    assert(lambda >= coordVar * 0.999,
           s"PC1 eigenvalue $lambda below best single-coordinate variance $coordVar")
  }

  test("q_join_interval emits each overlapping (session, incident) pair exactly once") {
    // the emit-once rule (bucket == overlap-start hour) replaces a
    // post-join distinct — so duplicates would be silent correctness
    // rot, not just waste. Pin uniqueness and overlap sanity.
    import org.apache.spark.sql.functions._
    val out = graft.ops.Joins.qJoinInterval(spark, sf)
    val n = out.count()
    assert(n > 0)
    assert(n == out.select("user_id", "sess", "inc_day").distinct().count(),
           "emit-once rule must yield exactly one row per overlapping pair")
    assert(out.where(col("overlap_s") < 0).count() == 0,
           "every emitted pair must genuinely overlap")
  }

  test("approx percentiles bracket the exact percentiles (accuracy bound)") {
    // percentile_approx at accuracy 10000 over ~thousands of rows per
    // group is near-exact: its rank error is bounded by n/accuracy.
    // Compare p50/p95 against the exact interpolated percentiles —
    // the sketch returns a real data point, so allow the gap between
    // neighboring order statistics around the target rank (bounded here
    // by a relative 5% + small absolute slack on this fixture).
    val approx = Aggregates.aAggPercentileApprox(spark, sf)
      .select(col("event_type"), col("p50").as("a50"), col("p95").as("a95"))
    val exact = Aggregates.qAggPercentileExact(spark, sf)
    val joined = approx.join(exact, "event_type")
    assert(joined.count() > 0)
    val bad = joined.where(
      abs(col("a50") - col("p50")) > greatest(abs(col("p50")) * 0.05, lit(1.0)) ||
      abs(col("a95") - col("p95")) > greatest(abs(col("p95")) * 0.05, lit(1.0))).count()
    assert(bad == 0, "approx percentile deviated beyond the accuracy bound")
  }

  test("set-op algebra: |A ∪all B| = |A| + |B|; except ⊆ left") {
    val n = Relational.qUnionAll(spark, sf).count()
    assert(n == Tables.customer(spark, sf).count() + Tables.supplier(spark, sf).count())
    val ex = Relational.qExcept(spark, sf)
    val lhs = Tables.lineitem(spark, sf).select(col("l_orderkey").as("orderkey")).distinct()
    assert(ex.join(lhs, Seq("orderkey"), "left_anti").count() == 0)
  }

  test("pagerank: node set preserved, ranks within the damping bounds") {
    val ranks = TextDedup.qGraphPagerank(spark, sf)
    val pairs = TextDedup.qDedupJaccard(spark, sf)
    val nodes = pairs.select(col("a_id").as("id"))
      .unionAll(pairs.select(col("b_id").as("id"))).distinct()
    // every graph node gets a rank, nothing extra appears
    assert(ranks.count() == nodes.count())
    assert(ranks.join(nodes, ranks("doc_id") === nodes("id"), "left_anti").count() == 0)
    // damping floor: rank >= 150000 always; total mass never exceeds
    // the initial n*1e6 (integer division only ever loses mass)
    assert(ranks.where(col("rank_fp") < 150000L).count() == 0)
    val total = ranks.agg(sum(col("rank_fp"))).head.getLong(0)
    assert(total <= nodes.count() * 1000000L)
  }

  test("bloom filter: zero false negatives; fpp within 4x design bound") {
    import graft.functions.BloomFilter
    val dim = Tables.customer(spark, sf)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val nKeys = dim.count()
    val bloom = dim.agg(BloomFilter.bloomAgg(col("c_custkey"), 1 << 17, 4).as("bf"))
    val probed = Tables.customer(spark, sf)
      .select(col("c_custkey"), (col("c_mktsegment") === "BUILDING").as("member"))
      .crossJoin(broadcast(bloom))
      .withColumn("hit", BloomFilter.bloomContains(col("bf"), col("c_custkey")))
    // no false negatives — every inserted key must probe true
    assert(probed.where(col("member") && !col("hit")).count() == 0)
    // false-positive rate of non-members within 4x the analytic bound
    val nonMembers = probed.where(!col("member"))
    val fp = nonMembers.where(col("hit")).count().toDouble
    val nProbes = nonMembers.count().toDouble
    val m = (1 << 17).toDouble
    val designFpp = math.pow(1.0 - math.exp(-4.0 * nKeys / m), 4.0)
    assert(nProbes == 0 || fp / nProbes <= math.max(4 * designFpp, 0.01),
      s"observed fpp ${fp / nProbes} vs design $designFpp (n=$nKeys)")
    // the pruned+verified join result equals the plain semi-join twin —
    // SYMMETRIC except over all columns (price rounded: both sides are
    // decimal-path sums but the comparison shouldn't hinge on the last
    // ulp of the final decimal→double cast), so missing groups and
    // value drift both fail
    val viaBloom = Joins.qJoinBloom(spark, sf)
      .select(col("o_orderpriority"), col("n_orders"),
        round(col("total_price"), 4).as("tp"))
    val exact = Tables.orders(spark, sf)
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(graft.ops.Util.dsum(col("o_totalprice")), 4).as("tp"))
    assert(viaBloom.except(exact).count() == 0 &&
           exact.except(viaBloom).count() == 0,
      "bloom-pruned join diverged from the exact semi-join twin")
  }

  test("quadratic twins refuse data-sized input, routing callers to the ANN scale path") {
    // The declared all-pairs oracle twins must FAIL FAST above the
    // configurable row cap instead of launching an n² crossJoin.
    // Simulate "oversized" by dropping the cap below the fixture size.
    val key = "graft.quadratic.maxRows"
    spark.conf.set(key, "10")
    try {
      for (q <- Seq(Vectors.qSimKnnJoin(_, _), Vectors.qDedupEmbed(_, _))) {
        val e = intercept[IllegalArgumentException](q(spark, sf))
        assert(e.getMessage.contains("a_sim_ann_lsh"),
               s"guard message must route to the ANN path: ${e.getMessage}")
      }
    } finally spark.conf.unset(key)
    // under the cap both still plan (the oracle-twin contract intact)
    assert(Vectors.qSimKnnJoin(spark, sf).limit(1).count() >= 0)
  }

  // ---- hub-skew guards (round-7 verdict ask #4): a synthetic hub ----
  // graph — one degree-300 star center + a triangle-rich periphery —
  // is exactly the shape that blows up an unguarded wedge join.

  /** Star hub 0—(1..300) + periphery triangles (i,i+1,i+2 chains over
    * 1..60) + hub-closing edges so triangles include the hub. */
  private def hubGraph: org.apache.spark.sql.DataFrame = {
    val star = (1 to 300).map(i => (0L, i.toLong))
    val chain = (1 to 58).map(i => (i.toLong, (i + 2).toLong))
    val ring = (1 to 59).map(i => (i.toLong, (i + 1).toLong))
    val all = (star ++ chain ++ ring).distinct
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    import spark.implicits._
    all.toDF("a_id", "b_id")
  }

  test("hubSaltedWedges: output multiset identical to the naive wedge join on a hub graph") {
    val pairs = hubGraph
    val edges = pairs.unionAll(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .select(col("a_id").as("u"), col("b_id").as("v"))
    val adj = edges.select(col("u").as("m"), col("v").as("e"))
    val nAdj = adj.count()
    // cap0=32 << hub degree 300 forces the salted path for the hub
    val salted = Util.hubSaltedWedges(spark, adj, nAdj, buckets = 4, cap0 = 32)
      .select("m", "u", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val naive = adj.select(col("m"), col("e").as("u"))
      .join(adj.select(col("m"), col("e").as("w")), "m")
      .select("m", "u", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(salted.size == naive.size, "salting changed the wedge count")
    assert(salted == naive, "salting changed the wedge multiset")
    // and the guard actually engaged: the join key carries the salt
    val plan = Util.hubSaltedWedges(spark, adj, nAdj, buckets = 4, cap0 = 32)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("_wsalt"), "hub-salt column absent from the plan")
  }

  test("orientTriangles: per-node counts match brute force on the hub graph") {
    val pairs = hubGraph
    val tri = TextDedup.orientTriangles(spark, pairs)
      .select(explode(array(col("x"), col("y"), col("z"))).as("u"))
      .groupBy("u").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // brute force in driver memory (graph is tiny)
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def adjacent(a: Long, b: Long) = es.contains((a, b)) || es.contains((b, a))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expect = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if adjacent(a, b) && adjacent(b, c) && adjacent(a, c)
    } { expect(a) += 1; expect(b) += 1; expect(c) += 1 }
    assert(tri == expect.toMap, "oriented enumeration diverged from brute force")
    // hub immunity: the wedge side of the oriented join is bounded by
    // out-degree, so the hub (rank-highest) must form NO wedges — its
    // arcs all point in. Verify the orientation really demoted it:
    // node 0 has degree 300 but its triangles all get counted at
    // low-rank corners. (If this ever regresses to id-ordering, node 0
    // would sit as mid-vertex for ~300² wedges.)
    assert(expect(0L) == tri.getOrElse(0L, 0L))
  }

  test("orientTriangles wide path (forced): packed closing-edge filter is triple-identical") {
    // the wide branch (data-sized arc exchange + graft_pair_contains
    // packed closing-edge filter) only engages past 4M edges — force it
    // onto the hub graph and require the EXACT triple set of the
    // default (broadcast semi join) path.
    val pairs = hubGraph
    val default = TextDedup.orientTriangles(spark, pairs)
      .collect().map(_.toString).sorted.toSeq
    spark.conf.set("graft.graph.wideEdges", "0")
    try {
      val widef = TextDedup.orientTriangles(spark, pairs)
      val p = widef.queryExecution.optimizedPlan.toString
      assert(p.contains("graft_pair_contains"),
             s"forced wide path did not use the packed filter:\n$p")
      val wideRows = widef.collect().map(_.toString).sorted.toSeq
      assert(wideRows == default, "wide path changed the triple set")
    } finally spark.conf.unset("graft.graph.wideEdges")
  }

  test("linkpred/2hop wide path: map-side pair-pack adjacency filter is row-identical to the anti-join") {
    // round 14: the pack filter IS the default (gate 0); the anti-join
    // branch (the pack-ineligible fallback) is forced by raising the
    // gate past the fixture edge count, and both paths must agree
    spark.conf.set("graft.graph.wideEdges", Long.MaxValue.toString)
    val (antiLp, anti2h) = try {
      (TextDedup.qGraphLinkpred(spark, sf).collect().map(_.toString).sorted.toSeq,
       TextDedup.qGraph2hop(spark, sf).collect().map(_.toString).sorted.toSeq)
    } finally spark.conf.unset("graft.graph.wideEdges")
    val lp = TextDedup.qGraphLinkpred(spark, sf)
    assert(lp.queryExecution.optimizedPlan.toString.contains("graft_pair_contains"),
           "default-path linkpred did not use the packed adjacency filter")
    assert(lp.collect().map(_.toString).sorted.toSeq == antiLp,
           "packed-filter linkpred changed the result set")
    val th = TextDedup.qGraph2hop(spark, sf)
    assert(th.queryExecution.optimizedPlan.toString.contains("graft_pair_contains"),
           "default-path 2hop did not use the packed adjacency filter")
    assert(th.collect().map(_.toString).sorted.toSeq == anti2h,
           "packed-filter 2hop changed the result set")
  }

  test("a_text_bpe: piece bounds, deterministic encode, merge-count monotonicity") {
    val merges = TextAnalysis.bpeMerges(spark, sf)
    assert(merges.nonEmpty && merges.distinct.size == merges.size,
           "merge table must be non-empty with unique pairs")
    val rankFull = merges.zipWithIndex.toMap
    val rankHalf = merges.take(merges.size / 2).zipWithIndex.toMap
    val vocab = TextAnalysis.docTokenCounts(spark, sf)
      .select(col("token")).distinct().collect().map(_.getString(0))
    vocab.foreach { t =>
      val p = TextAnalysis.bpeEncode(t, rankFull)
      assert(p >= 1 && p <= t.length,
             s"pieces($t)=$p outside [1, ${t.length}]")
      assert(p == TextAnalysis.bpeEncode(t, rankFull),
             s"re-encode of $t diverged — encode is not deterministic")
      // lowest-rank-first greedy with a PREFIX of the merge list ends
      // exactly where the prefix-encode ends before the extra merges
      // apply, so more merges can never INCREASE the piece count
      assert(p <= TextAnalysis.bpeEncode(t, rankHalf),
             s"$t: full merge table produced MORE pieces than half table")
    }
    // the aggregate readout is consistent with the invariants
    val rows = TextAnalysis.aTextBpe(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ws = r.getAs[Long]("n_ws_tokens"); val bp = r.getAs[Long]("n_bpe_pieces")
      assert(bp >= ws, "every token is at least one piece")
      assert(r.getAs[Long]("pieces_per_token_fp") >= 10000L)
    }
  }

  test("a_text_bpe sampled-vocab path (forced graft.bpe.maxVocab): bounds + determinism hold") {
    // the vocab-collect guard (round-10 verdict #4): past
    // graft.bpe.maxVocab the trainer sees only the top-frequency
    // vocabulary slice — force a tiny cap and require the declared
    // contract to survive the sampled path: a non-empty deterministic
    // table, piece bounds on EVERY token (incl. the out-of-sample ones
    // the sampled trainer never saw), and the aggregate readout's
    // invariants
    spark.conf.set("graft.bpe.maxVocab", "50")
    try {
      val merges = TextAnalysis.bpeMerges(spark, sf)
      assert(merges.nonEmpty && merges.distinct.size == merges.size,
             "sampled-vocab merge table must be non-empty with unique pairs")
      assert(merges == TextAnalysis.bpeMerges(spark, sf),
             "sampled-vocab training is not deterministic")
      val rank = merges.zipWithIndex.toMap
      val vocab = TextAnalysis.docTokenCounts(spark, sf)
        .select(col("token")).distinct().collect().map(_.getString(0))
      vocab.foreach { t =>
        val p = TextAnalysis.bpeEncode(t, rank)
        assert(p >= 1 && p <= t.length,
               s"sampled path: pieces($t)=$p outside [1, ${t.length}]")
      }
      val rows = TextAnalysis.aTextBpe(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_bpe_pieces") >= r.getAs[Long]("n_ws_tokens"))
        assert(r.getAs[Long]("pieces_per_token_fp") >= 10000L)
      }
    } finally spark.conf.unset("graft.bpe.maxVocab")
  }

  test("q_dedup_cluster scale path (forced star fixpoint) is row-identical to pointer-jump") {
    // The past-threshold branch must be TESTED on the fixture, not
    // assumed (the a_sim_ann_ivf forced-IMI discipline): force the
    // star gate to 0 so the fixture takes the sf100 path, and compare
    // against the default pointer-jump result row-for-row.
    val key = "graft.cc.pointerJumpMaxEdges"
    val default = TextDedup.qDedupCluster(spark, sf).collect().toSeq
    spark.conf.set(key, "0")
    try {
      val starred = TextDedup.qDedupCluster(spark, sf).collect().toSeq
      assert(starred == default,
             "star fixpoint and pointer-jump disagree on the same pair graph")
    } finally spark.conf.unset(key)
  }

  test("editdist pigeonhole gate: substitutions complete, ±3-char shifts covered, 1-char-indel residue pinned") {
    // Adversarial fixtures for q_dedup_editdist's chunk-fingerprint gate
    // (round-8 ADVICE): the gate's coverage claims are enforced here,
    // and its DECLARED residue — indel net-shifts that are not a
    // multiple of the 3-char chunk width — is pinned as a visible test,
    // not a comment.
    // 81 DISTINCT printable chars: every 3-gram is unique, so no chunk
    // equality can arise by content coincidence — only by true alignment.
    val base = (33 until 114).map(_.toChar).mkString
    def gateHolds(a: String, b: String): Boolean = {
      val df = spark.range(1).select(lit(a).as("a_pfx"), lit(b).as("b_pfx"))
        .withColumn("a_sig", expr(
          "transform(sequence(0, 26), c -> hash(substring(a_pfx, c * 3 + 1, 3)))"))
        .withColumn("b_sig", expr(
          "transform(sequence(0, 26), c -> hash(substring(b_pfx, c * 3 + 1, 3)))"))
      df.select(graft.functions.StringFilters
          .anyAlignedEqual(col("a_sig"), col("b_sig")).as("g"))
        .head.getBoolean(0)
    }
    def lev(a: String, b: String): Long =
      spark.range(1).select(levenshtein(lit(a), lit(b)).cast("long")).head.getLong(0)
    val a80 = base.take(80)
    // (1) SUBSTITUTIONS are pigeonhole-complete: 25 edits dirty at most
    // 25 of 27 chunks — adversarial one-per-chunk spread AND 20 seeded
    // random 25-subsets must all pass.
    def subst(s: String, ps: Seq[Int]): String =
      ps.foldLeft(s)((acc, p) => acc.updated(p, 'þ'))
    assert(gateHolds(a80, subst(a80, 0 until 75 by 3)),
           "one-substitution-per-chunk spread must leave >=2 clean chunks")
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { i =>
      val ps = rnd.shuffle((0 until 80).toList).take(25)
      assert(gateHolds(a80, subst(a80, ps)), s"random substitution set $i dropped a true pair")
    }
    // (2) ±3-char net shifts are covered by the ±1-index acceptance
    // (this round's widening): a 3-char leading cut/paste realigns every
    // later chunk one index over.
    assert(gateHolds(a80, base.drop(3).take(80)), "3-char leading deletion must pass (b_sig[c]==a_sig[c+1])")
    assert(gateHolds(a80, ("úûü" + base).take(80)), "3-char leading insertion must pass")
    // (3) THE DECLARED RESIDUE: a 1-char leading indel (net shift not a
    // multiple of 3) dirties every aligned AND ±1-shifted chunk of this
    // all-distinct string — a true lev<=25 pair the gate drops. This is
    // the op's documented fixture-scale band (verified absent from the
    // fixture corpus by the ungated-DP oracle at sf0.01/sf0.1/sf1); if
    // this assertion ever flips, the gate grew real indel coverage and
    // the op's scaladoc band should be re-stated.
    val ins1 = ("ú" + base).take(80)
    assert(lev(a80, ins1) <= 25, "fixture must be a true pair for the residue pin to mean anything")
    assert(!gateHolds(a80, ins1),
           "1-char-indel pair unexpectedly PASSED: the declared band has changed — update the scaladoc")
  }
}
