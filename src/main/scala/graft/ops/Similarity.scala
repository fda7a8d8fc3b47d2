package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Brute-force cosine top-k is the exact baseline; the
  * LSH-bucketed variant is the scale path: random-hyperplane signs bucket
  * the corpus so each query only scans its bucket (and optionally
  * neighboring probes).
  */
object Similarity {

  /** Rank candidates per query on the 6-dp-ROUNDED similarity — the q25
    * cross-engine replay discipline (round 11, ADVICE r10): ranking on
    * unrounded sims makes rank parity depend on last-bit FP agreement
    * between engines; rounding both sides to 6 dp BEFORE the
    * row_number (with c_id as the deterministic tie-break) removes
    * that data-dependent assumption. Every top-k path here returns the
    * rounded sim. Input: (q_id, c_id, sim). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("sim", round(col("sim"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), col("c_id"))))
      .filter(col("rank") <= k)

  /** Exact brute-force cosine top-k: broadcast the (small) query set,
    * scan the corpus once, rank per query. Returns
    * (q_id, c_id, sim, rank); sim rounded to 6 dp before ranking
    * ([[rankTopK]]). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    rankTopK(corpus.join(broadcast(q), col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("c_id"),
        Fns.cosine(col("qv"), col(vecCol)).as("sim")), k)
  }

  /** Symmetric per-vector int8 quantization — the memory-bandwidth
    * lever for a 100 TB embedding table: 4 bytes/dim float32 → 1
    * byte/dim, with the scale factor kept per vector.
    * `q_i = round(x_i / q_scale)`, `q_scale = max|x| / 127` (floored at
    * 1e-12 so all-zero vectors quantize to zeros instead of NaN), so
    * `q_i ∈ [-127, 127]`. Cosine similarity is EXACTLY preserved up to
    * rounding — the per-vector scales cancel:
    * `cos(s1·q1, s2·q2) = cos(q1, q2)` (see [[quantizedCosine]]).
    * Adds `q_scale: double` and `q_vec: array<int>`; pure column
    * expressions, no UDFs. */
  def quantizeInt8(vecs: DataFrame, vecCol: String): DataFrame =
    vecs
      .withColumn("q_scale",
        greatest(
          array_max(transform(col(vecCol), x => abs(x.cast("double"))))
            / 127.0,
          lit(1e-12)))
      .withColumn("q_vec",
        transform(col(vecCol),
          x => round(x.cast("double") / col("q_scale")).cast("int")))

  /** Cosine over int8-quantized vectors: the per-vector scales cancel,
    * so this is the integer cosine of the q-vectors — the reconstruction
    * `s·q` is never materialized. Uses the codegen'd native dot product
    * (int arrays are cast once to double arrays by the lift). */
  def quantizedCosine(qa: org.apache.spark.sql.Column,
      qb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.plans.VecDotExpr
    // explicit cast: the dot lift's lazy cast only fires on resolved
    // expressions, and int arrays must widen to double either way
    val a = transform(qa, _.cast("double"))
    val b = transform(qb, _.cast("double"))
    VecDotExpr.dot(a, b) /
      (sqrt(VecDotExpr.dot(a, a)) * sqrt(VecDotExpr.dot(b, b)))
  }

  /** [[bruteForceTopK]] over int8-quantized vectors — the 100 TB
    * memory-bandwidth variant (1 byte/dim streamed instead of 4): both
    * sides quantize per-vector, similarity is [[quantizedCosine]]
    * (scales cancel; only int8 rounding perturbs ranks — recall
    * measured by `tools/AnnRecall`). */
  def bruteForceTopKQuantized(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val qc = quantizeInt8(corpus, vecCol)
    val qq = quantizeInt8(queries, vecCol)
      .select(col(idCol).as("q_id"), col("q_vec").as("qqv"))
    rankTopK(qc.join(broadcast(qq), col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("c_id"),
        quantizedCosine(col("qqv"), col("q_vec")).as("sim")), k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a value in [-1, 1) derived from the portable hash — reproducible
    * across engines and runs with no RNG state. */
  private def planeComponent(plane: Int, dim: org.apache.spark.sql.Column) =
    Fns.portableHash60(concat(lit(s"plane$plane:"), dim.cast("string")))
      .cast("double") / lit(1L << 59).cast("double") - 1.0

  /** Sign-random-projection bucket id: `planes` hyperplane sign bits.
    * Vectors in the same bucket are ANN candidates. */
  def lshBucket(vecCol: org.apache.spark.sql.Column,
      planes: Int): org.apache.spark.sql.Column = {
    val dims = org.apache.spark.sql.functions.sequence(lit(0),
      size(vecCol) - 1)
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vecCol, transform(dims, d => planeComponent(p, d)),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Scala-side replica of [[planeComponent]]: identical md5-hex15 →
    * [-1, 1) formula and identical IEEE ops, so buckets computed from
    * these driver-precomputed weights are bit-identical to the dynamic
    * column form (spec-pinned). */
  private def planeComponentValue(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane$plane:$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59).toDouble - 1.0
  }

  /** [[lshBucket]] with the hyperplanes precomputed on the driver and
    * shipped as array LITERALS — the dynamic form evaluates
    * `planes × dims` md5 expressions per ROW (512 md5s/row at the
    * default 8×64: measured 37% of q114's sf10 time), pure waste since
    * the weights depend only on (plane, dim). `dims` must equal the
    * vector dimensionality exactly: a shorter literal zip_with-pads
    * with nulls and NULLs the dot. */
  def lshBucket(vecCol: org.apache.spark.sql.Column, planes: Int,
      dims: Int): org.apache.spark.sql.Column = {
    require(dims > 0, s"dims must be positive, got $dims")
    val bits = (0 until planes).map { p =>
      val w = array((0 until dims).map(d =>
        lit(planeComponentValue(p, d))): _*)
      val dot = aggregate(
        zip_with(vecCol, w, (x, wc) => x.cast("double") * wc),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    // Loud runtime guard (ADVICE r10): a dims/vector-length mismatch
    // would zip_with-pad with nulls, NULL the dot, and degrade every
    // bucket to the all-zero-bit value — plausible-looking and silent.
    // ADDITIVE form, not a when() wrap: wrapping the 8-plane fold in a
    // CASE branch measurably deoptimized it (q114 sf10 1.04 → 1.9 s —
    // conditional branches are excluded from codegen subexpression
    // handling, so the fold re-evaluates per reference); the guard
    // term is a separate cheap expression that raises on mismatch and
    // adds 0 otherwise.
    bits.reduce(_ + _) +
      coalesce(assert_true(size(vecCol) === dims,
          lit(s"lshBucket: vector length != dims $dims")).cast("long"),
        lit(0L))
  }

  /** IVF centroids: deterministic seeding (the corpus rows whose id
    * hashes lowest — akin to k-means||'s first round, reproducible
    * with no RNG) followed by `lloydRounds` rounds of Lloyd's
    * refinement: assign every vector to its nearest centroid
    * (broadcast centroids, ONE corpus scan per round, map-side-
    * combinable `min_by` argmax — no window over the corpus×centroid
    * product), recompute each cell's element-wise mean, keep the old
    * centroid for a cell that went empty. Hash-seeded cells are
    * luck-of-the-draw Voronoi quality; 2–3 Lloyd rounds move
    * centroids to the data's actual modes, which is what makes the
    * nProbe/nCells probe fraction hold its recall (measured in
    * `tools/AnnRecall`). Ties break deterministically (higher cosine,
    * then lower cent_id). Returns (cent_id, cv: array<double>).
    *
    * Determinism discipline (round 11, the q116 oracle contract): cell
    * means are computed as EXACT integer micro-unit sums — each
    * component is fixed-pointed once (`round(x·10⁷)` as long, the
    * sumMicro/PageRank discipline), summed associatively, and divided
    * once — so the centroid doubles are bit-identical regardless of
    * partitioning, row order, or engine (a plain `avg(double)` is
    * none of those: FP summation order varies with the shuffle). The
    * 10⁻⁷ input quantization is far below any recall-relevant signal.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, lloydRounds: Int = 2): DataFrame = {
    var centroids = corpus
      .withColumn("__h", Fns.portableHash60(col(idCol).cast("string")))
      // id tie-break: md5 collisions are ~impossible but the total
      // order must not depend on one either way
      .orderBy(col("__h"), col(idCol)).limit(nCells)
      .select(col(idCol).as("cent_id"),
        transform(col(vecCol), _.cast("double")).as("cv"))
      .localCheckpoint(true) // nCells rows; cut lineage per round
    (0 until lloydRounds).foreach { _ =>
      val assigned = assignCells(corpus, centroids, idCol, vecCol)
      // element-wise mean per cell: posexplode → (cell, dim) partial
      // micro-unit sums (map-side combine keeps the shuffle at
      // |corpus|·dims slim rows) → one terminal division → rebuild the
      // vector in dim order
      val means = assigned
        .select(col("cell").as("cent_id"),
          posexplode(transform(col(vecCol),
            x => round(x.cast("double") * 1e7).cast("long")))
            .as(Seq("pos", "mx")))
        .groupBy("cent_id", "pos")
        .agg(sum(col("mx")).as("sm"), count(lit(1)).as("cnt"))
        .groupBy("cent_id")
        .agg(collect_list(struct(col("pos"),
          (col("sm").cast("double") / (col("cnt").cast("double") * 1e7))
            .as("m"))).as("pm"))
        .select(col("cent_id"),
          transform(array_sort(col("pm")), _.getField("m")).as("cv"))
      centroids = centroids.select(col("cent_id"), col("cv").as("old_cv"))
        .join(means, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("cv"), col("old_cv")).as("cv"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Nearest-centroid assignment: broadcast the centroid set, one
    * corpus scan, argmax cosine via `min_by` over (-sim, cent_id) —
    * partial-aggregates map-side, so the exchange carries one slim row
    * per vector id instead of windowing the corpus×centroid product.
    * The argmax compares 6-dp-ROUNDED cosines (the [[rankTopK]] replay
    * discipline: with bit-identical centroids, rounding makes the
    * assignment independent of last-bit FP evaluation differences;
    * 6-dp ties break on cent_id deterministically on both engines).
    * Returns the input columns plus `cell`. */
  def assignCells(df: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val scored = df.join(broadcast(centroids))
      .select(col(idCol), col(vecCol), col("cent_id"),
        round(Fns.cosine(col(vecCol), col("cv")), 6).as("__sim"))
    scored.groupBy(idCol)
      .agg(
        min_by(col("cent_id"), struct(negate(col("__sim")), col("cent_id")))
          .as("cell"),
        first(col(vecCol)).as(vecCol))
  }

  /** IVF-style ANN: partition the corpus into `nCells` Voronoi cells
    * around [[ivfCentroids]] (deterministic seed + Lloyd refinement),
    * then answer queries by probing the `nProbe` nearest cells only.
    * At 100 TB the cell assignment is a broadcast-join scan and each
    * query touches nProbe/nCells of the corpus. Returns
    * (q_id, c_id, sim, rank).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16,
      nProbe: Int = 4, lloydRounds: Int = 2): DataFrame = {
    val centroids =
      ivfCentroids(corpus, idCol, vecCol, nCells, lloydRounds)
        .localCheckpoint(true) // reused by both assignments below
    val cells = assignCells(corpus, centroids, idCol, vecCol)
    // query side: top-nProbe cells per query — the window stays here,
    // where the input is queries×centroids (small by construction)
    val qcells = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .join(broadcast(centroids))
      .select(col("q_id"), col("qv"), col("cent_id").as("cell"),
        round(Fns.cosine(col("qv"), col("cv")), 6).as("__sim"))
      .withColumn("__rn", row_number().over(Window.partitionBy("q_id")
        .orderBy(desc("__sim"), col("cell"))))
      .filter(col("__rn") <= nProbe)
      .drop("__sim", "__rn")
    rankTopK(cells.join(broadcast(qcells), Seq("cell"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("c_id"),
        Fns.cosine(col("qv"), col(vecCol)).as("sim")), k)
  }

  /** IVF ANN with ADAPTIVE per-query probing: instead of a fixed
    * `nProbe`, each query probes its nearest cells (by centroid
    * cosine) until the probed cells together hold at least
    * `coverage` of the corpus's vectors — the minimal prefix of the
    * centroid ranking whose cumulative CELL MASS reaches the target,
    * never fewer than `minProbe` cells.
    *
    * Why mass, not cell count: a fixed probe=1 is exactly where the
    * measured recall floor lives on clustered data (0.718–0.754 at
    * 1/16 scan, `ann_recall_r8.txt`) — queries that land between
    * clusters, and skewed cell masses where the nearest cell holds 2%
    * of the corpus, both starve the candidate set while "1 cell"
    * sounds like a fixed budget. Mass coverage is the quantity the
    * scan cost actually scales with (each query reads
    * Σ probed-cell rows), so the knob bounds COST directly and recall
    * follows: measured recall@10 ≥ 0.97 on the clustered torture
    * corpus at coverage 0.25 (tools/AnnRecall).
    *
    * Cost shape: identical joins to [[ivfTopK]] plus one cell-mass
    * aggregation (nCells output rows) and a 1-row total — both
    * broadcast; the per-query cell ranking window still runs on
    * queries×centroids. The corpus is scanned once for assignment
    * masses and once for candidates; a standing deployment
    * materializes the assignment table once and amortizes both. */
  def ivfTopKAdaptive(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int = 16,
      coverage: Double = 0.25, minProbe: Int = 1,
      lloydRounds: Int = 2): DataFrame = {
    require(coverage > 0.0 && coverage <= 1.0 && minProbe >= 1)
    val centroids =
      ivfCentroids(corpus, idCol, vecCol, nCells, lloydRounds)
        .localCheckpoint(true) // reused by both assignments below
    val cells = assignCells(corpus, centroids, idCol, vecCol)
    val masses = cells.groupBy("cell").agg(count(lit(1)).as("__mass"))
      .localCheckpoint(true) // nCells rows; avoids a 3rd corpus scan
    val total = masses.agg(sum("__mass").as("__total"))
    // per-query centroid ranking, annotated with each cell's mass and
    // the mass ACCUMULATED BEFORE it; keep the minimal covering prefix
    // (the cell that crosses the target is included)
    val w = Window.partitionBy("q_id")
      .orderBy(desc("__sim"), col("cell"))
    val qcells = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .join(broadcast(centroids))
      .select(col("q_id"), col("qv"), col("cent_id").as("cell"),
        round(Fns.cosine(col("qv"), col("cv")), 6).as("__sim"))
      .join(broadcast(masses), Seq("cell"), "left")
      .withColumn("__mass", coalesce(col("__mass"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__before", coalesce(sum(col("__mass")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__rn") <= minProbe ||
        col("__before") < col("__total") * coverage)
      .select("q_id", "qv", "cell")
    rankTopK(cells.join(broadcast(qcells), Seq("cell"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("c_id"),
        Fns.cosine(col("qv"), col(vecCol)).as("sim")), k)
  }

  /** LSH-bucketed ANN top-k: bucket corpus and queries by
    * sign-random-projection, rank within the shared bucket. Trades recall
    * for a corpus-scan-free plan — at 100 TB each query touches one
    * bucket (~corpus/2^planes rows).
    *
    * Query-side join strategy is SIZE-GATED (round 11): an interactive
    * k-NN query set is tiny and broadcasts (the corpus never shuffles);
    * but when the "queries" are a full dedup shard, driver-broadcasting
    * them is exactly the anti-pattern this module exists to avoid — at
    * or above the session's `autoBroadcastJoinThreshold` (estimated
    * from the optimized plan's stats, no job run) the bucket equi-join
    * runs as a shuffle join on the bucket key instead (shuffle_hash:
    * the bucket join needs no sort, and the query side is the smaller
    * build side). Plan-asserted in the spec.
    *
    * `queryBroadcast` overrides the gate when the caller knows better
    * than the estimate (size-only stats do not reduce through filters,
    * so an 8-row slice of a 50 MB table estimates as 50 MB):
    * `Some(true)` pins the interactive broadcast path, `Some(false)`
    * pins the shard-scale shuffle path, `None` trusts the stats. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 8, dims: Int = -1,
      queryBroadcast: Option[Boolean] = None): DataFrame = {
    // dims > 0 takes the precomputed-hyperplane path (bit-identical
    // buckets, none of the per-row md5 work) — pass it whenever the
    // embedding dimensionality is known, which at 100 TB it always is.
    def bucketOf(c: org.apache.spark.sql.Column) =
      if (dims > 0) lshBucket(c, planes, dims) else lshBucket(c, planes)
    val cb = corpus.withColumn("bucket", bucketOf(col(vecCol)))
    val qb = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("bucket", bucketOf(col("qv")))
    val qSide = if (queryBroadcast.getOrElse(broadcastable(queries)))
      broadcast(qb) else qb.hint("shuffle_hash")
    rankTopK(cb.join(qSide,
        cb("bucket") === qb("bucket") && col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("c_id"),
        Fns.cosine(col("qv"), col(vecCol)).as("sim")), k)
  }

  /** Whether a frame's OPTIMIZED-PLAN size estimate fits the session's
    * autoBroadcastJoinThreshold — the same statistic the planner would
    * use, read driver-side with no job. A disabled threshold (-1)
    * means never broadcast. */
  private def broadcastable(df: DataFrame): Boolean = {
    val threshold = org.apache.spark.sql.internal.SQLConf.get
      .autoBroadcastJoinThreshold
    threshold > 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold
  }

  /** Multi-probe LSH top-k ([[lshTopK]]'s recall lever at EQUAL planes):
    * each query probes its primary bucket plus the buckets reached by
    * flipping its lowest-|margin| hyperplane bits, one flip per extra
    * probe. The margin |dot(q, plane_p)| is how close q sits to plane p
    * — the planes most likely to put a true near neighbor on the other
    * side — so probing those buckets first recovers most of
    * single-probe LSH's lost recall at the same scan fraction
    * (measured: `ann_recall_r11.txt`; the classic multi-probe LSH
    * idea, Lv et al. VLDB'07). `probes` = total buckets per query.
    *
    * Plan shape: identical to [[lshTopK]] with a probes× query-side
    * explode — corpus-side cost (one bucket pass, no corpus scan per
    * query) is unchanged, and candidate sets from distinct buckets are
    * disjoint (a vector lives in exactly one bucket), so no dedup step
    * is needed. Probe order is deterministic: margin ties break on the
    * lower plane index. Same size-gated query-side join as [[lshTopK]].
    */
  def lshTopKMultiProbe(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 8,
      dims: Int = 64, probes: Int = 4,
      queryBroadcast: Option[Boolean] = None): DataFrame = {
    require(dims > 0, s"dims must be positive, got $dims")
    require(probes >= 1 && probes <= planes + 1,
      s"probes must be in [1, planes+1], got $probes (planes=$planes)")
    require(planes <= 50, "plane bit must fit an exact double pow2")
    val cb = corpus.withColumn("bucket",
      lshBucket(col(vecCol), planes, dims))
    // per-plane dots of the QUERY vector (the margins), same driver-
    // precomputed hyperplane literals as lshBucket
    def dotsOf(vc: org.apache.spark.sql.Column) =
      array((0 until planes).map { p =>
        val w = array((0 until dims).map(d =>
          lit(planeComponentValue(p, d))): _*)
        aggregate(zip_with(vc, w, (x, wc) => x.cast("double") * wc),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
    val qb0 = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("__dots", when(size(col("qv")) === dims, dotsOf(col("qv")))
        .otherwise(raise_error(concat(
          lit("lshTopKMultiProbe: vector length "),
          size(col("qv")).cast("string"), lit(s" != dims $dims")))))
      // primary bucket from the dots (sign bits — identical values to
      // lshBucket, which recomputes the same IEEE ops)
      .withColumn("__b0", (0 until planes).map(p =>
        when(element_at(col("__dots"), p + 1) >= 0, lit(1L << p))
          .otherwise(0L)).reduce(_ + _))
      // plane ids by ascending |margin| (struct sort tie-breaks on the
      // plane id), then one single-bit flip per extra probe
      .withColumn("__flip", transform(array_sort(
        transform(sequence(lit(0), lit(planes - 1)), p =>
          struct(abs(element_at(col("__dots"), p + 1)).as("m"),
            p.as("p")))), s => s.getField("p")))
      .withColumn("bucket", explode(concat(array(col("__b0")),
        transform(slice(col("__flip"), 1, probes - 1), p =>
          col("__b0").bitwiseXOR(pow(lit(2.0), p).cast("long"))))))
      .select(col("q_id"), col("qv"), col("bucket"))
    val qSide = if (queryBroadcast.getOrElse(broadcastable(queries)))
      broadcast(qb0) else qb0.hint("shuffle_hash")
    rankTopK(cb.join(qSide,
        cb("bucket") === qb0("bucket") && col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("c_id"),
        Fns.cosine(col("qv"), col(vecCol)).as("sim")), k)
  }
}
