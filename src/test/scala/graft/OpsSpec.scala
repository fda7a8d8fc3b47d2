package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

class OpsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again today"),
    (2L, "the quick brown fox jumps over the lazy dog again today"),
    (3L, "the quick brown fox jumps over the lazy cat again today"),
    (4L, "completely different words form unrelated content here now"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id")
      .collect()
    assert(out.length == 3)
    assert(out.head.getAs[Long]("keep_id") == 1L)
    assert(out.head.getAs[Long]("copies") == 2L)
  }

  test("minhash LSH finds identical docs with est_sim 1.0") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text").collect()
    val p12 = pairs.find(r => r.getAs[Long]("a_id") == 1L &&
      r.getAs[Long]("b_id") == 2L)
    assert(p12.isDefined)
    assert(p12.get.getAs[Double]("est_sim") == 1.0)
    // near-dup 1~3 should estimate high-but-below-1 if found
    pairs.filter(r => r.getAs[Long]("b_id") == 3L)
      .foreach(r => assert(r.getAs[Double]("est_sim") < 1.0))
  }

  test("LSH candidate counts == counts derived from the pair list") {
    // duplication-heavy corpus: 5 verbatim copies + 2 near-dups + an
    // isolated doc — the aggregate must agree with per-doc partner
    // counts read off the enumerated pairs, including the zero row
    val dup = (1L to 5L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again today"))
    val near = Seq(
      (6L, "the quick brown fox jumps over the lazy cat again today"),
      (7L, "the quick brown fox jumps over the lazy cow again today"))
    val lone = Seq(
      (8L, "completely different words form unrelated content here now"))
    val corpus = (dup ++ near ++ lone).toDF("doc_id", "text")
    val got = Dedup
      .minhashLshCandidateCounts(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val pairs = Dedup.minhashLsh(corpus, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val fromPairs = pairs.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
      .groupBy(_._1).map { case (id, ps) =>
        id -> ps.map(_._2).distinct.size.toLong
      }
    assert(got.size == 8)
    got.foreach { case (id, n) =>
      assert(n == fromPairs.getOrElse(id, 0L),
        s"doc $id: aggregate $n vs pairs ${fromPairs.getOrElse(id, 0L)}")
    }
    assert(got(1L) >= 4L) // each copy sees at least its 4 twins
  }

  test("full near-dup pipeline: LSH candidates -> groups -> kept corpus") {
    // the composed at-scale shape: candidate pairs from banding,
    // transitive closure, one representative kept per dup cluster
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .select(col("a_id"), col("b_id"))
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .collect().map(_.getAs[Long]("doc_id")).toSeq.sorted
    // docs 1 and 2 are identical -> one of them (the min id) survives
    assert(kept.contains(1L) && !kept.contains(2L))
    assert(kept.size < docs.count())
  }

  test("simhash: identical docs equal, near docs close, far docs far") {
    val sigs = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) == sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
  }

  test("ngram jaccard: identical = 1.0, near-dup above threshold") {
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", 0.3)
      .orderBy("a_id", "b_id").collect()
    val p12 = out.find(r => r.getAs[Long]("a_id") == 1L &&
      r.getAs[Long]("b_id") == 2L).get
    assert(p12.getAs[Double]("jaccard") == 1.0)
    val p13 = out.find(r => r.getAs[Long]("a_id") == 1L &&
      r.getAs[Long]("b_id") == 3L).get
    assert(p13.getAs[Double]("jaccard") > 0.3 &&
      p13.getAs[Double]("jaccard") < 1.0)
  }

  test("dropDuplicatesByContent keeps exactly the first of each group") {
    val out = Dedup.dropDuplicatesByContent(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 4L))
  }

  test("ngramJaccard maxDf cap drops hot shingles symmetrically") {
    // with a generous cap nothing changes
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", 0.3,
      maxDf = 1000).orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    val plain = Dedup.ngramJaccard(docs, "doc_id", "text", 0.3)
      .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    assert(capped == plain)
    // with maxDf=1 every shared shingle is dropped -> no pairs at all
    assert(Dedup.ngramJaccard(docs, "doc_id", "text", 0.0, maxDf = 1)
      .count() == 0)
  }

  test("embedding near-dup within blocks (incl. exact duplicates)") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(1f, 0.01f, 0f), 0),
      (3L, Array(0f, 1f, 0f), 0), (4L, Array(1f, 0f, 0f), 1),
      (5L, Array(1f, 0f, 0f), 0)) // exact duplicate of 1 in block 0
      .toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingNearDup(vecs, "vec_id", "embedding",
      "label", 0.95).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // (1,2) near; (1,5) identical -> intra pair; (2,5) near via the
    // duplicate's expansion; (1,4) blocked apart; (1,3) orthogonal
    assert(out == Set((1L, 2L), (1L, 5L), (2L, 5L)))
    val intraSim = Dedup.embeddingNearDup(vecs, "vec_id", "embedding",
      "label", 0.95).filter("a_id = 1 and b_id = 5")
      .head().getAs[Double]("sim")
    assert(math.abs(intraSim - 1.0) < 1e-9)
  }

  test("int8 quantization preserves cosine within rounding error") {
    val rnd = new scala.util.Random(31)
    val vecs = (0L until 50L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 4 - 2))).toDF(
      "vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, "embedding")
    // all components land in [-127, 127]; all-zero vector stays zeros
    val zero = Similarity.quantizeInt8(
      Seq((99L, Array.fill(8)(0f))).toDF("vec_id", "embedding"),
      "embedding").collect().head
    assert(zero.getAs[scala.collection.Seq[Int]]("q_vec").forall(_ == 0))
    q.collect().foreach { r =>
      assert(r.getAs[scala.collection.Seq[Int]]("q_vec")
        .forall(v => v >= -127 && v <= 127))
    }
    // pairwise cosine on quantized vectors ≈ float cosine (scales
    // cancel exactly; the only error is the per-component rounding)
    def dd(c: org.apache.spark.sql.Column) = transform(c, _.cast("double"))
    val pairs = q.as("a").join(q.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(
        graft.functions.Fns.cosine(dd(col("a.embedding")),
          dd(col("b.embedding"))).as("exact"),
        Similarity.quantizedCosine(col("a.q_vec"), col("b.q_vec"))
          .as("approx"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02,
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("symmetric-delete fuzzy join == naive blocked pairwise at " +
      "d=1 and d=2 (recall-exactness)") {
    import graft.ops.FuzzyJoin
    val rnd = new scala.util.Random(43)
    // tiny alphabet + short lengths force dense near-pair structure,
    // incl. duplicates, empties, and 1-char strings
    val strs = (0L until 180L).map { i =>
      val n = rnd.nextInt(7) // 0..6
      (i, (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString,
        s"b${rnd.nextInt(2)}")
    }.toDF("id", "s", "blk")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "a_val", "b_val", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getInt(4))).toSet
    Seq(1, 2).foreach { d =>
      val fast = canon(FuzzyJoin.editDistanceJoin(strs, "id", "s", d,
        Seq("blk")))
      val naive = canon(FuzzyJoin.editDistanceJoinBlocked(strs, "id",
        "s", d, Seq("blk")))
      assert(fast == naive, s"d=$d: ${fast.size} vs ${naive.size}")
      assert(fast.nonEmpty)
    }
  }

  test("fuzzy match counts == per-id partner counts of the enumerated " +
      "pair list, incl. duplicated strings") {
    import graft.ops.FuzzyJoin
    val rnd = new scala.util.Random(47)
    // same dense near-pair generator as the join spec; the i%3
    // replication plants exact-duplicate strings so the intra-group
    // (g-1) term is exercised, not just the cross-string mass
    val strs = (0L until 150L).map { i =>
      val n = rnd.nextInt(6)
      val s = (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
      (i, if (i % 3 == 0) "dup" + (i % 6) else s, s"b${rnd.nextInt(2)}")
    }.toDF("id", "s", "blk")
    Seq(1, 2).foreach { d =>
      val pairs = FuzzyJoin.editDistanceJoin(strs, "id", "s", d,
        Seq("blk"))
      // every pair row contributes one partner to each side
      val expected = pairs.select(col("a_id").as("id"))
        .unionByName(pairs.select(col("b_id").as("id")))
        .groupBy("id").agg(count(lit(1)).as("n"))
      val exp = strs.select(col("id"))
        .join(expected, Seq("id"), "left")
        .select(col("id"), coalesce(col("n"), lit(0L)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = FuzzyJoin.editDistanceMatchCounts(strs, "id", "s", d,
        Seq("blk"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exp, s"d=$d")
      assert(got.values.exists(_ > 0))
    }
  }

  test("quantized brute-force topk matches exact topk on separated " +
      "clusters") {
    val rnd = new scala.util.Random(41)
    // 4 well-separated direction clusters: int8 rounding cannot flip
    // a rank across a margin this wide, so the quantized search must
    // return the identical top-k sets
    val centers = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val vecs = (0L until 40L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x * 10 + rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = sets(Similarity.bruteForceTopK(vecs, queries,
      "vec_id", "embedding", 3))
    val quant = sets(Similarity.bruteForceTopKQuantized(vecs, queries,
      "vec_id", "embedding", 3))
    // the guarantee int8 rounding CANNOT break is the wide margin:
    // every returned neighbor is from the query's own direction
    // cluster (near-ties WITHIN a cluster may legitimately reorder —
    // that is the measured ~1% recall cost, tools/AnnRecall)
    assert(quant.size == exact.size)
    quant.foreach { case (q, c) => assert(c % 4 == q % 4, s"($q,$c)") }
  }

  test("brute-force topk ranks the identical vector first") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0.05f)), (3L, Array(0f, 1f)),
      (4L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L)
    val out = Similarity.bruteForceTopK(corpus, queries, "vec_id",
      "embedding", 2).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("c_id")).toSeq == Seq(2L, 3L))
  }

  test("lsh topk puts identical vectors in the same bucket") {
    val corpus = Seq(
      (1L, Array(1f, 0f, 2f)), (2L, Array(1f, 0f, 2f)),
      (3L, Array(-1f, 3f, 0f))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L)
    val out = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
      k = 3, planes = 4).collect()
    assert(out.exists(r => r.getAs[Long]("c_id") == 2L &&
      math.abs(r.getAs[Double]("sim") - 1.0) < 1e-12))
  }

  test("precomputed-hyperplane lsh buckets are bit-identical to the " +
      "dynamic form") {
    val rnd = new scala.util.Random(53)
    val vecs = (0L until 200L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    Seq(4, 8, 12).foreach { planes =>
      val both = vecs.select(
        Similarity.lshBucket(col("embedding"), planes).as("dyn"),
        Similarity.lshBucket(col("embedding"), planes, 64).as("pre"))
        .collect()
      assert(both.forall(r => r.getLong(0) == r.getLong(1)),
        s"planes=$planes")
      // non-degenerate: more than one bucket realized
      assert(both.map(_.getLong(0)).distinct.length > 1)
    }
  }

  test("mismatched dims fails loudly at the entry point via the " +
      "one-shot pre-flight, never a silent all-zero bucket (ADVICE " +
      "r10; moved out of the per-row hot path round 12)") {
    val vecs = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(2f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    Seq(
      () => Similarity.lshTopK(vecs, vecs, "vec_id", "embedding",
        k = 1, planes = 4, dims = 64),
      () => Similarity.lshTopKMultiProbe(vecs, vecs, "vec_id",
        "embedding", k = 1, planes = 4, dims = 64, probes = 2)
    ).foreach { build =>
      val err = intercept[IllegalArgumentException](build())
      assert(err.getMessage.contains("!= dims 64"),
        s"expected the pre-flight length message, got: $err")
    }
  }

  test("NULL embedding vectors get their own pre-flight message, not " +
      "a misleading length mismatch (ADVICE r11)") {
    val vecs = Seq((1L, Array(1f, 2f, 3f)), (2L, null))
      .toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Similarity.lshTopK(vecs, vecs, "vec_id", "embedding",
        k = 1, planes = 4, dims = 3)
    }
    assert(err.getMessage.contains("NULL"),
      s"expected the NULL-vector message, got: $err")
    assert(!err.getMessage.contains("!= dims"))
  }

  test("salted shard-scale lsh is bit-identical to the unsalted form " +
      "(round 12: hot-bucket skew medicine)") {
    val rnd = new scala.util.Random(31)
    // skew on purpose: half the corpus is one duplicated vector → one
    // hot bucket; the salted join must still emit the same rows
    val hot = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val vecs = (0L until 240L).map(i =>
      (i, if (i % 2 == 0) hot.clone()
          else Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id", "sim", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    val plain = rows(Similarity.lshTopK(vecs, vecs, "vec_id",
      "embedding", k = 3, planes = 4, dims = 16,
      queryBroadcast = Some(false)))
    val salted = rows(Similarity.lshTopK(vecs, vecs, "vec_id",
      "embedding", k = 3, planes = 4, dims = 16,
      queryBroadcast = Some(false), saltBuckets = 7))
    assert(salted == plain)
  }

  test("multi-probe lsh: probes=1 equals lshTopK; extra probes only " +
      "ADD candidates; probe sets are deterministic") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 300L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val queries = vecs.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // k larger than any bucket population: the rank cut never drops a
    // candidate, so the pair sets compare candidate GENERATION exactly
    val single = pairs(Similarity.lshTopK(vecs, queries, "vec_id",
      "embedding", k = 1000, planes = 5, dims = 16))
    val mp1 = pairs(Similarity.lshTopKMultiProbe(vecs, queries,
      "vec_id", "embedding", k = 1000, planes = 5, dims = 16,
      probes = 1))
    assert(mp1 == single)
    val mp3 = pairs(Similarity.lshTopKMultiProbe(vecs, queries,
      "vec_id", "embedding", k = 1000, planes = 5, dims = 16,
      probes = 3))
    assert(single.subsetOf(mp3))
    assert(mp3.size > single.size) // the flips reach real neighbors here
    // determinism: bucket sets (and so pair sets) replay identically
    val mp3b = pairs(Similarity.lshTopKMultiProbe(vecs, queries,
      "vec_id", "embedding", k = 1000, planes = 5, dims = 16,
      probes = 3))
    assert(mp3 == mp3b)
    // disjoint-bucket argument: no (q, c) pair may be emitted twice
    val mpRows = Similarity.lshTopKMultiProbe(vecs, queries, "vec_id",
      "embedding", k = 1000, planes = 5, dims = 16, probes = 3)
      .select("q_id", "c_id").collect()
    assert(mpRows.length == mpRows.distinct.length)
    // SECOND RING (round 12): probes may exceed planes+1 — two-bit
    // flips join the sequence, ordered by summed rounded margin. The
    // candidate set stays monotone in probes, deterministic, and
    // duplicate-free (two-bit masks still XOR to distinct buckets).
    val mp8 = pairs(Similarity.lshTopKMultiProbe(vecs, queries,
      "vec_id", "embedding", k = 1000, planes = 5, dims = 16,
      probes = 8))
    assert(mp3.subsetOf(mp8))
    assert(mp8.size > mp3.size)
    val mp8rows = Similarity.lshTopKMultiProbe(vecs, queries, "vec_id",
      "embedding", k = 1000, planes = 5, dims = 16, probes = 8)
      .select("q_id", "c_id").collect()
    assert(mp8rows.length == mp8rows.distinct.length)
    assert(mp8 == pairs(Similarity.lshTopKMultiProbe(vecs, queries,
      "vec_id", "embedding", k = 1000, planes = 5, dims = 16,
      probes = 8)))
    // exhausting every weight-≤2 perturbation (1 + 5 + 10 = 16) stays
    // monotone; it covers the Hamming-≤2 ball, not all 2^planes
    // buckets, so it need not (and does not) equal the exact scan
    val mpAll = pairs(Similarity.lshTopKMultiProbe(vecs, queries,
      "vec_id", "embedding", k = 1000, planes = 5, dims = 16,
      probes = 16))
    assert(mp8.subsetOf(mpAll))
  }

  test("fuzzy match counts: NULL-string ids come out with 0, never " +
      "dropped (ADVICE r10)") {
    val rows = Seq((1L, "alpha"), (2L, "alphb"), (3L, null),
      (4L, "omega")).toDF("id", "name").withColumn("blk", lit(1))
    val out = graft.ops.FuzzyJoin.editDistanceMatchCounts(rows, "id",
      "name", 1, Seq("blk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
  }

  test("near-dup groups: transitive closure of candidate pairs") {
    // two components, one needing >1 propagation round (chain 3-2-1,
    // edge listed high-to-low so labels must flow against edge order),
    // plus a pair component; doc 6 appears in no pair
    val pairs = Seq((3L, 2L), (2L, 1L), (5L, 4L)).toDF("a_id", "b_id")
    val groups = Dedup.nearDupGroups(pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
    // gate-forced distributed path must agree with the driver
    // union-find exactly
    val dist = Dedup.nearDupGroups(pairs, "a_id", "b_id",
        driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == groups)
    val docs = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    // one representative per component + the untouched doc 6
    assert(kept == Seq(1L, 4L, 6L))
  }

  test("near-dup groups: non-convergence at maxIter fails loudly") {
    // a 5-hop chain cannot converge in 2 rounds of min-label
    // propagation — silent exit would keep several representatives of
    // one dup cluster, so the operator must throw instead
    val chain = (1L until 6L).map(i => (i + 1, i)).toDF("a_id", "b_id")
    val err = intercept[IllegalStateException] {
      Dedup.nearDupGroups(chain, "a_id", "b_id", maxIter = 2,
        driverEdgeLimit = 0).collect()
    }
    assert(err.getMessage.contains("did not converge"))
    // and the same graph converges fine with the default budget
    val ok = Dedup.nearDupGroups(chain, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(1L))
  }

  test("near-dup groups: 100-hop chain converges inside the default " +
      "budget (pointer halving)") {
    // plain min-label propagation needs O(diameter) = 100 rounds here,
    // far past maxIter = 20; the compressed walk needs O(log 100)
    val chain = (1L until 101L).map(i => (i + 1, i)).toDF("a_id", "b_id")
    val groups = Dedup.nearDupGroups(chain, "a_id", "b_id",
        driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size == 101 && groups.values.toSet == Set(1L))
  }

  test("near-dup groups: one action per CC round (fused halving, " +
      "lazy-checkpoint convergence probe)") {
    // each round must cost ONE action — the label-sum convergence
    // probe, which also materializes the round's lazy localCheckpoint
    // — and ONE join + one agg of plan. A separate halving self-join,
    // an own-label re-join, or an eager checkpoint + count pair all
    // add scheduler jobs (AQE runs ~1 job per shuffle stage): the
    // unfused r4 shape measured 44 jobs on this graph, the fused one
    // 32. The bound sits between them to catch a regression to any
    // of the unfused forms.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val chain = (1L until 9L).map(i => (i + 1, i)).toDF("a_id", "b_id")
      .localCheckpoint(true) // input materialized before counting
    spark.sparkContext.addSparkListener(listener)
    val groups =
      try {
        val g = Dedup.nearDupGroups(chain, "a_id", "b_id",
            driverEdgeLimit = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        Thread.sleep(1500) // drain the async listener bus
        g
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(groups.size == 9 && groups.values.toSet == Set(1L))
    assert(jobs.get <= 36,
      s"per-round fusion regressed: ${jobs.get} jobs for an 8-chain " +
        "(fused shape measures 32, the unfused r4 shape 44)")
  }

  test("semantic dedup: tight clusters collapse to one kept member, " +
      "the centroid-nearest one") {
    val vecs = Seq(
      (1L, Array(10f, 0f, 0f)), (2L, Array(9.8f, 0.5f, 0f)),
      (3L, Array(9.9f, 0.2f, 0f)),
      (4L, Array(0f, 10f, 0f)), (5L, Array(0.3f, 9.9f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        nCells = 2, threshold = 0.95, lloydRounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4),
        r.getDouble(2))).toSeq
    // every intra-cluster pair clears 0.95, no cross-cluster pair does
    // -> exactly two groups, one kept member each
    val byGroup = out.groupBy(_._2)
    assert(byGroup.size == 2)
    assert(byGroup.values.map(_.map(_._1).toSet).toSet ==
      Set(Set(1L, 2L, 3L), Set(4L, 5L)))
    byGroup.values.foreach { members =>
      val kept = members.filter(_._3)
      assert(kept.size == 1, "exactly one kept member per group")
      // the keep rule: highest cosine to the cell centroid
      assert(kept.head._4 == members.map(_._4).max)
    }
  }

  test("near-dup groups: empty pair set is a no-op") {
    val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.nearDupGroups(noPairs, "a_id", "b_id").count() == 0)
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Dedup.dropNearDuplicates(docs, "doc_id", noPairs)
      .count() == 2)
  }

  test("repetition signals: duplicate line and word fractions") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "spam line\nspam line\nspam line\nunique"),  // 2/4 dup lines
      (2L, "all words distinct here"),
      (3L, "buy buy buy now"),                          // 2/4 dup words
      (4L, ""),                                         // empty: 0.0
      (5L, "a\n\n\na")                                  // empties dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("dup_line_frac"),
          r.getAs[Double]("dup_word_frac"))).toMap
    assert(out(1L)._1 == 0.5)
    assert(out(2L) == ((0.0, 0.0)))
    assert(out(3L)._2 == 0.5)
    assert(out(4L) == ((0.0, 0.0)))
    assert(out(5L)._1 == 0.5) // two non-empty 'a' lines, one repeat
  }

  test("pii redaction masks emails, ips, phones") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or +4915112345678 now"),
      (2L, "server at 192.168.0.1 went down"),
      (3L, "no pii here; version 1.2 is fine")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "contact <EMAIL> or <PHONE> now")
    assert(out(2L) == "server at <IP> went down")
    assert(out(3L) == "no pii here; version 1.2 is fine")
  }

  test("sequence chunking: fixed windows with overlap, short tail kept") {
    import graft.ops.TextAnalysis
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "x y"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "text", 6, 2)
      .select(col("doc_id"), col("chunk_idx"),
        array_join(col("chunk_tokens"), " ").as("t"), col("n_tokens"))
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, 0, "a b c d e f", 6),  // step = 6 - 2 = 4:
      (1L, 1, "e f g h i j", 6),  // chunk 1 re-reads e f (overlap)
      (1L, 2, "i j", 2),          // short tail kept
      (2L, 0, "x y", 2)))         // empty doc 3: no chunks
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(docs, "text", 4, 4)
    }
    assert(err.getMessage.contains("overlap"))
  }

  test("deterministic sampling: stable, stratified, retry-safe") {
    import graft.ops.Sampling
    val docs = (1L to 2000L).map(i =>
      (i, if (i % 4 == 0L) "de" else "en")).toDF("doc_id", "lang")
    val s1 = Sampling.sample(docs, col("doc_id"), 0.3)
    // determinism: identical result on re-execution and repartition
    assert(s1.collect().map(_.getLong(0)).toSet ==
      Sampling.sample(docs.repartition(7), col("doc_id"), 0.3)
        .collect().map(_.getLong(0)).toSet)
    // fraction lands near target (hash-uniformity at n=2000)
    val n = s1.count().toDouble / 2000
    assert(n > 0.25 && n < 0.35, s"got $n")
    // stratified: en downsampled, de kept whole
    val strat = Sampling.stratifiedSample(docs, col("lang"),
      col("doc_id"), Map("en" -> 0.1), default = 1.0)
    val byLang = strat.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 500)      // default 1.0: all kept
    assert(byLang("en") < 250)       // 0.1 of 1500 ± hash noise
  }

  test("curation pipeline: quality gate, lang id, keep-first dedup") {
    val long = ("the cat is on the mat and the dog is of the house " * 2)
      .trim // 24 words, stopword-rich -> passes the gate
    val d = Seq(
      (1L, long),
      (2L, long), // exact duplicate -> dropped (keep-first = id 1)
      (3L, "too short"), // fails minWords
      (4L, long + " extra tail words here")).toDF("doc_id", "text")
    val out = TextAnalysis.curate(d, "doc_id", "text").orderBy("doc_id")
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 4L))
    assert(out.forall(_.getAs[String]("predicted_lang") == "en"))
    assert(out.forall(_.getAs[Double]("quality_score") >= 0.3))
  }

  test("language id predicts via stopword scores") {
    val d = Seq((1L, "the cat is on the mat"), (2L, "der hund und das ist"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.languageId(d, "text").orderBy("doc_id")
      .collect().map(_.getAs[String]("predicted_lang")).toSeq
    assert(out == Seq("en", "de"))
  }

  test("markup stripping: blocks vanish whole, entities decode once, " +
      "encoded tags survive as text") {
    val docs = Seq(
      (1L, "<p>Hello <b>world</b></p>"),
      (2L, "a<script>var x = \"<b>danger</b>\";</script>b"),
      (3L, "<STYLE media=\"all\">p{}</STYLE>keep"),
      (4L, "&lt;notatag&gt; &amp;amp; &quot;q&quot; &#39;s&#39;"),
      (5L, "a   b\n\nc\t d"),
      (6L, "x < y and z > w")).toDF("doc_id", "text")
    val out = TextAnalysis.stripMarkup(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "Hello world")
    assert(out(2L) == "a b") // script body incl. inner tags dropped whole
    assert(out(3L) == "keep") // case-insensitive, attributes allowed
    assert(out(4L) == "<notatag> &amp; \"q\" 's'") // decoded AFTER tag
    // pass; double-encoded &amp;amp; decodes exactly once
    assert(out(5L) == "a b c d") // whitespace collapsed
    assert(out(6L) == "x w") // bare <...> spans strip like tags — the
    // documented cost of regex-level stripping (same in the oracle)
  }

  test("contamination: shared n-grams found, benchmark-only and clean " +
      "docs absent") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 4-gram with b1
      (2L, "one two three four five"), // clean
      (3L, "alpha beta gamma delta zeta")) // shares the same 4-gram
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta omega")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, bench, "doc_id", "text",
        n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 3L -> 1L))
  }

  test("quality + token counts + fingerprint are deterministic") {
    val out = TextAnalysis.fingerprint(
      TextAnalysis.tokenCounts(
        TextAnalysis.qualityScore(docs, "text"), "text"), "text")
      .orderBy("doc_id").collect()
    assert(out.head.getAs[Int]("n_words") == 11)
    assert(out.head.getAs[Int]("ws_tokens") == 11)
    assert(out.head.getAs[Long]("fingerprint") ==
      out(1).getAs[Long]("fingerprint")) // identical texts
    assert(out.head.getAs[Long]("fingerprint") !=
      out(3).getAs[Long]("fingerprint"))
  }

  test("multimodal: binary plumbing, per-partition decode, frame plan") {
    val items = Multimodal.asMediaItems(docs, "doc_id", "text", "video")
    assert(items.schema("content").dataType.typeName == "binary")
    val feats = Multimodal.decodeFeatures(spark, items, partitions = 2)
    val rows = feats.collect()
    assert(rows.length == 4)
    assert(rows.forall(_.feature.length == 16))
    assert(rows.forall(f => f.width >= 1 && f.width <= 640))
    // identical payloads decode identically (determinism)
    val byId = rows.map(f => f.media_id -> f).toMap
    assert(byId(1L).feature.toSeq == byId(2L).feature.toSeq)
    val frames = Multimodal.sampleFrames(feats, stride = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx"))
    assert(frames.count() > 0)
    // resize: 16-bin histogram pooled to 4 bins, mass preserved (x4 avg)
    val pooled = Multimodal.poolFeatures(feats, 4).collect()
    pooled.foreach { r =>
      val orig = r.getAs[scala.collection.Seq[Float]]("feature")
      val p = r.getAs[scala.collection.Seq[Double]]("pooled")
      assert(p.length == 4)
      assert(math.abs(p.sum * 4 - orig.map(_.toDouble).sum) < 1e-6)
    }
  }

  test("image header decode: real PNG/JPEG/GIF dimensions from bytes") {
    import graft.ops.Multimodal.ImageHeaders
    // an actual 1x1 PNG file (the canonical transparent pixel)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkY" +
        "Phf/x8AAwMCAO+ip1sAAAAASUVORK5CYII=")
    assert(ImageHeaders.dimensions(png).contains((1, 1)))
    // minimal JPEG: SOI + APP0(JFIF) + SOF0 with height=2, width=3
    val jpeg = Array(
      0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x02, 0x00, 0x03, 0x01,
      0x01, 0x11, 0x00).map(_.toByte)
    assert(ImageHeaders.dimensions(jpeg).contains((3, 2)))
    // JPEG with 0xFF fill/padding bytes before markers (legal per
    // T.81 §B.1.1.2) and a TEM (0x01) standalone marker — the walk
    // must skip padding instead of reading a bogus length from it
    val jpegPadded = Array(
      0xff, 0xd8,                       // SOI
      0xff, 0xff, 0xff, 0x01,           // fill bytes + TEM (standalone)
      0xff, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // padded APP0, len 4
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x07, 0x00, 0x06, 0x01,
      0x01, 0x11, 0x00).map(_.toByte)   // SOF0: height=7, width=6
    assert(ImageHeaders.dimensions(jpegPadded).contains((6, 7)))
    // GIF89a logical screen 4x5 (little-endian dims)
    val gif = "GIF89a".getBytes ++
      Array(0x04, 0x00, 0x05, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    assert(ImageHeaders.dimensions(gif).contains((4, 5)))
    // non-image bytes: no dimensions
    assert(ImageHeaders.dimensions("plain text".getBytes).isEmpty)

    // end-to-end through the Spark decode path: real dims for the PNG
    // row, deterministic stub fallback for the text row
    import TestSpark.spark.implicits._
    val items = Seq(
      graft.ops.MediaItem(1L, "image", png, png.length.toLong),
      graft.ops.MediaItem(2L, "image", "not an image".getBytes,
        12L)).toDF()
    val feats = Multimodal.decodeFeatures(spark, items).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 1 && feats(1L).height == 1)
    assert(feats(2L).width >= 1 && feats(2L).feature.length == 16)
  }

  test("audio decode: real WAV PCM to rate/channels/frames/histogram") {
    import graft.ops.Multimodal
    // 100-frame square wave at ±0.5 amplitude, 16-bit signed LE mono
    // 8 kHz: amplitude +0.5 -> bin 12, -0.5 -> bin 4, half each
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
      true, false)
    val pcm = new Array[Byte](100 * 2)
    (0 until 100).foreach { i =>
      val v = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val wavBytes = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 100),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavBytes)
    val wav = wavBytes.toByteArray

    import TestSpark.spark.implicits._
    val items = Seq(
      graft.ops.MediaItem(1L, "audio", wav, wav.length.toLong),
      graft.ops.MediaItem(2L, "audio", "not audio".getBytes, 9L)).toDF()
    val out = Multimodal.decodeFeatures(spark, items,
      Multimodal.JdkDecoder).collect().map(f => f.media_id -> f).toMap
    val a = out(1L)
    assert(a.width == 8000 && a.height == 1 && a.n_frames == 100)
    assert(a.feature(12) == 0.5f && a.feature(4) == 0.5f)
    assert(a.feature.sum == 1.0f)
    // undecodable audio: deterministic stub fallback, still well-formed
    assert(out(2L).feature.length == 16)
  }

  test("ImageIO pixel decode: real luminance histogram from a PNG") {
    import graft.ops.Multimodal
    // 4x2 PNG with known pixels: 4 white (luma 255 -> bin 15),
    // 2 black (bin 0), 2 mid-gray 0x808080 (luma 128 -> bin 8)
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Array(
      0xffffff, 0xffffff, 0x000000, 0x808080,
      0xffffff, 0xffffff, 0x000000, 0x808080)
    img.setRGB(0, 0, 4, 2, px, 0, 4)
    val bytes = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bytes)
    val png = bytes.toByteArray

    // 1x1 PNG whose pixel decodes to ARGB 0x7f0000ff (semi-transparent
    // blue): luma = 114*255/1000 = 29 -> bin 1
    val onePix = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkY" +
        "Phf/x8AAwMCAO+ip1sAAAAASUVORK5CYII=")

    import TestSpark.spark.implicits._
    val items = Seq(
      graft.ops.MediaItem(1L, "image", png, png.length.toLong),
      graft.ops.MediaItem(2L, "image", onePix, onePix.length.toLong),
      graft.ops.MediaItem(3L, "audio", "wav???".getBytes, 6L)).toDF()
    val out = Multimodal.decodeFeatures(spark, items,
      Multimodal.ImageIODecoder).collect().map(f => f.media_id -> f).toMap

    val f1 = out(1L)
    assert(f1.width == 4 && f1.height == 2 && f1.n_frames == 1)
    assert(f1.feature(15) == 0.5f)  // 4/8 white
    assert(f1.feature(0) == 0.25f)  // 2/8 black
    assert(f1.feature(8) == 0.25f)  // 2/8 mid-gray
    assert(f1.feature.sum == 1.0f)
    val f2 = out(2L)
    assert(f2.width == 1 && f2.height == 1 && f2.feature(1) == 1.0f)
    // audio falls back to the stub (no codec): still well-formed
    assert(out(3L).feature.length == 16)
  }

  test("real pixel resize: image items re-encode at target dims, " +
      "others pass through") {
    import graft.ops.Multimodal
    val png = Multimodal.SyntheticMedia.pngItem(4) // 24x12
    val wav = Multimodal.SyntheticMedia.wavItem(1)
    val resized = Multimodal.resizeImages(spark,
      Seq(png, wav).toDS().toDF(), 8, 8).collect()
    val img = resized.find(_.media_type == "image").get
    val out = Multimodal.ImageIODecoder
      .decode(Iterator.single(img)).next()
    assert(out.width == 8 && out.height == 8)
    assert(img.n_bytes == img.content.length.toLong)
    // non-image untouched, undecodable image bytes untouched
    val aud = resized.find(_.media_type == "audio").get
    assert(aud.content.sameElements(wav.content))
    val junk = graft.ops.MediaItem(7L, "image", Array[Byte](1, 2), 2L)
    assert(Multimodal.resizeImages(spark, Seq(junk).toDS().toDF(), 8, 8)
      .collect().head.content.sameElements(junk.content))
  }

  test("video decode: RIFF walk + per-frame ImageIO on a generated AVI") {
    import graft.ops.Multimodal
    val item = Multimodal.SyntheticMedia.aviItem(3) // 20x8, 3 frames
    // container round-trip: the frames come back as written
    val streams = Multimodal.RiffVideo.frameStreams(item.content)
    assert(streams.size == 3)
    val out = Multimodal.VideoDecoder.decode(Iterator.single(item)).next()
    assert(out.width == 20 && out.height == 8 && out.n_frames == 3)
    // closed-form expected histogram over all frames
    val expect = new Array[Long](16)
    for (j <- 0 until 3; y <- 0 until 8; x <- 0 until 20)
      expect(((x * 7 + y * 13 + 3 * 31 + j * 17) % 256) >> 4) += 1
    val total = 3L * 20 * 8
    val got = out.feature.map(f => math.round(f.toDouble * total))
    assert(got.sameElements(expect), got.mkString(","))
    // non-RIFF video bytes fall back to the stub, not an exception
    val junk = Multimodal.VideoDecoder.decode(Iterator.single(
      graft.ops.MediaItem(9L, "video", Array[Byte](1, 2, 3), 3L))).next()
    assert(junk.media_id == 9L)
  }

  test("synthetic media decodes to its closed-form histogram (q64 gate)") {
    import graft.ops.Multimodal
    import TestSpark.spark.implicits._
    // the q64 oracle's premise, checked at the library level: decoding
    // SyntheticMedia through the REAL JDK codecs reproduces the integer
    // formulas the SQL mirror replays
    val items = Seq(2L, 7L).map(Multimodal.SyntheticMedia.item).toDF()
    val out = Multimodal.decodeFeatures(spark, items,
      Multimodal.JdkDecoder).collect().map(f => f.media_id -> f).toMap
    // i=2: PNG, w = 8+(2%5)*4 = 16, h = 8+(2%3)*4 = 16
    val img = out(2L)
    assert(img.media_type == "image" && img.width == 16 &&
      img.height == 16 && img.n_frames == 1)
    val wantImg = new Array[Int](16)
    for (x <- 0 until 16; y <- 0 until 16)
      wantImg(((x * 7 + y * 13 + 2 * 31) % 256) / 16) += 1
    (0 until 16).foreach { b =>
      assert(math.round(img.feature(b) * 256.0) == wantImg(b), s"bin $b")
    }
    // i=7: WAV, n = 2000+(7%5)*400 = 2800 samples @8000 Hz mono
    val aud = out(7L)
    assert(aud.media_type == "audio" && aud.width == 8000 &&
      aud.height == 1 && aud.n_frames == 2800)
    val wantAud = new Array[Int](16)
    for (j <- 0 until 2800)
      wantAud(((j * 1103 + 7 * 12345) % 65536) / 4096) += 1
    (0 until 16).foreach { b =>
      assert(math.round(aud.feature(b) * 2800.0) == wantAud(b), s"bin $b")
    }
  }

  test("Multiset count arithmetic ≡ built-in exceptAll/intersectAll") {
    // Differential against the engine's own bag semantics, including
    // NULL keys (set ops group NULLs as equal, like GROUP BY) and keys
    // present on only one side.
    val a = Seq(Some("x"), Some("x"), Some("x"), Some("y"), None, None,
      Some("only_a")).toDF("f")
    val b = Seq(Some("x"), Some("y"), Some("y"), None,
      Some("only_b")).toDF("f")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.getString(0)), r.getLong(1)))
        .sortBy(_._1)
    val wantEx = canon(a.exceptAll(b).groupBy("f")
      .agg(count(lit(1)).as("n")))
    val gotEx = canon(graft.ops.Multiset.exceptAllCounts(a, b, Seq("f")))
    assert(gotEx.toSeq == wantEx.toSeq, s"except_all: $gotEx vs $wantEx")
    val wantIn = canon(a.intersectAll(b).groupBy("f")
      .agg(count(lit(1)).as("n")))
    val gotIn = canon(graft.ops.Multiset
      .intersectAllCounts(a, b, Seq("f")))
    assert(gotIn.toSeq == wantIn.toSeq,
      s"intersect_all: $gotIn vs $wantIn")
    // and the count-arithmetic plan must NOT replicate rows
    val plan = graft.ops.Multiset.exceptAllCounts(a, b, Seq("f"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("replicaterows"), plan)
    // single-pass form: same multiset cardinalities for BOTH ops out
    // of one key-count join (the q45 shape)
    val both = graft.ops.Multiset.setOpCounts(a, b, Seq("f")).collect()
      .map(r => (r.getString(1), Option(r.getString(0)), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val want = (wantEx.map(t => ("except_all", t._1, t._2)) ++
      wantIn.map(t => ("intersect_all", t._1, t._2)))
      .sortBy(t => (t._1, t._2))
    assert(both.toSeq == want.toSeq, s"setOpCounts: ${both.toSeq}")
    // exactly ONE lineage of each input: the scans/aggregations appear
    // once in the single-pass plan (vs twice in the unioned form)
    val onePass = graft.ops.Multiset.setOpCounts(a, b, Seq("f"))
      .queryExecution.optimizedPlan.toString
    assert("LocalRelation".r.findAllIn(onePass).size == 2, onePass)
  }
}
