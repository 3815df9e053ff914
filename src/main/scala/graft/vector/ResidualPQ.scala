package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** RESIDUAL product quantization (round 10) — the construction
  * `faiss.IndexIVFPQ` actually uses (Jégou et al. 2011 §III-A; the
  * reference's index type at local_db.py:50–52): vectors are PQ-encoded
  * as residuals x − centroid(x) against the IVF coarse quantizer, so the
  * codebooks model the (much smaller) within-cluster displacement
  * instead of absolute position. Same byte cost as raw PQ, strictly less
  * quantization error wherever the coarse quantizer captures structure —
  * measured in ResidualPQSpec and SCALE.md.
  *
  * Retrieval here is the EXACT rung, not approximate ADC: the per-row
  * stored error err = ‖r − ĉ(r)‖ brackets the true distance exactly as
  * in [[PQIndex.searchExact]] (d̂ = ‖q − (centroid + ĉ(r))‖² is the
  * distance to the full reconstruction, so √d̂ ± err brackets ‖q − x‖ by
  * the triangle inequality) — a provable candidate superset from a
  * codes-only pass, float-reranked. The exact rung computes d̂ as one
  * codegen'd per-row fold over a flat ADC-table literal (see
  * `exactBounds`); the approximate ADC rungs ([[search]]/[[searchBatch]])
  * keep the RELATIONAL form — a (cluster, s, code) → partial-distance
  * frame (nlist·m·|book| narrow rows, built driver-side per query like
  * FAISS's per-probe ADC tables, broadcast) joined to the exploded codes —
  * because there the probed-cluster restriction rides the join keys.
  *
  * Scope: build + exact search + incremental [[append]] + [[ResidualPQ.save]]/
  * [[ResidualPQ.load]] persistence + diagnostics — the full lifecycle
  * matrix the facade's other index families carry (r10 VERDICT #2).
  * FAISS's guidance still applies: appends encode against the TRAINED
  * coarse quantizer and codebooks (no retraining), so quantization error
  * grows if the corpus drifts — rebuild to retrain. Exactness is
  * unaffected either way: the per-row stored err makes the bound valid
  * for ANY assignment/codebook.
  */
final class ResidualPQ(val codes: DataFrame, // (id, cluster, codes, err)
                       val centroids: Array[(Int, Array[Double])],
                       val codebooks: Array[Array[Array[Double]]],
                       val dim: Int,
                       private val retained: Seq[DataFrame] = Nil) {

  val m: Int = codebooks.length
  private val subDim = dim / m

  def dispose(): Unit = retained.foreach(_.unpersist(blocking = false))

  /** Mean squared quantization error over the corpus — the measured
    * advantage over raw PQ (same m, same corpus). */
  def meanErr2: Double =
    codes.agg(avg(pow(col("err"), lit(2.0)))).head().getDouble(0)

  /** Incremental maintenance (≙ hnsw `add_items`, local_db.py:78–80;
    * [[PQIndex.append]]'s residual analog): each batch row is assigned to
    * its nearest EXISTING coarse centroid (the quantizer stays trained —
    * FAISS's add-to-trained-index contract), its residual encoded with
    * the EXISTING codebooks, one mapPartitions pass over the batch only,
    * unioned into the codes frame. The per-row stored err keeps
    * [[searchExact]]'s bracket valid for appended rows regardless of how
    * well the trained quantizer fits them — exactness never degrades,
    * only pruning selectivity does. */
  def append(batch: DataFrame, idCol: String, vecCol: String): ResidualPQ = {
    val base = batch.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val batchCodes = ResidualPQ.encodeFrame(base, centroids, codebooks, dim)
      .persist(StorageLevel.MEMORY_AND_DISK)
    new ResidualPQ(
      codes.select(col("id").cast("long"), col("cluster").cast("int"),
          col("codes").cast("array<int>"), col("err").cast("double"))
        .unionByName(batchCodes),
      centroids, codebooks, dim, retained :+ batchCodes)
  }

  /** Per-query (cluster, s, code) partial squared distances:
    * ‖(q − centroid_c)_s − codebook_s(code)‖². */
  private def qdFrame(query: Array[Double]): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val rows = for {
      (c, cen) <- centroids.toSeq
      s <- 0 until m
      (book, j) <- codebooks(s).zipWithIndex.map(x => (x._1, x._2))
    } yield {
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val x = (query(s * subDim + i) - cen(s * subDim + i)) - book(i)
        d += x * x; i += 1
      }
      (c, s, j, d)
    }
    rows.toDF("cluster", "s", "code", "d2")
  }

  /** FAISS `IndexIVFPQ`'s actual QUERY path (round 11 — the approximate
    * ADC rung beside [[searchExact]]'s exact one): the `nprobe` coarse
    * cells nearest to q are selected driver-side (the centroid table is
    * nlist × dim doubles — never corpus-sized), the codes frame prunes to
    * those clusters (at rest this is partition pruning on a
    * `partitionBy(cluster)` layout), and the broadcast per-cluster ADC
    * frame join + ONE map-side-combined sum computes d̂ = ‖q − recon‖²
    * over probed rows only. Approximate on two axes exactly like FAISS
    * (quantized distances + probed subset); recall pinned in
    * ResidualPQSpec, never fixed contents. Output contract =
    * [[ExactKNN.topK]]: (id, score = 1/(1+d̂)), score desc, id asc. */
  def search(query: Array[Double], k: Int, nprobe: Int = 4,
             restrict: Option[DataFrame] = None): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    val probed = centroids.sortBy { case (_, cen) =>
      var d = 0.0; var i = 0
      while (i < dim) { val x = query(i) - cen(i); d += x * x; i += 1 }
      d
    }.take(nprobe).map(_._1)
    val qd = qdFrame(query).where(col("cluster").isin(probed.map(Int.box): _*))
    // `restrict` (first column = id) thins the PROBED rows before the ADC
    // join — the facade's filter-pushed-into-the-probe contract: cluster
    // pruning first, then the allow-list semi-join, so a filtered query
    // still reads nprobe/nlist of the codes
    val pruned = codes.where(col("cluster").isin(probed.map(Int.box): _*))
    val basis = restrict
      .map(r => pruned.join(
        r.select(col(r.columns(0)).cast("long").as("id")), Seq("id"), "left_semi"))
      .getOrElse(pruned)
    basis
      .select(col("id"), col("cluster"), posexplode(col("codes")).as(Seq("s", "code")))
      .join(broadcast(qd), Seq("cluster", "s", "code"))
      .groupBy(col("id"))
      .agg(sum(col("d2")).as("dist"))
      .select(col("id"), (lit(1.0) / (lit(1.0) + col("dist"))).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** BULK residual ADC: N queries against the compressed corpus as ONE
    * distributed plan (round 11 — [[PQIndex.searchBatch]]'s residual
    * analog, completing the family's batch matrix). Fully relational, no
    * driver loop: per-query coarse probing is queries × the broadcast
    * centroid table cut to `nprobe` by a bounded per-key heap; the
    * per-(query, cluster) ADC tables are a FRAME — probed (qid, cluster)
    * pairs × the broadcast (cluster, s, code, cen_s, book) grid, d̂
    * partials as one codegen'd expression — and the codes explode streams
    * through the broadcast table join into a map-side-combined
    * groupBy(qid, id) sum. The probed restriction rides the equi-join
    * keys: un-probed (qid, cluster) pairs simply have no table rows.
    * Output contract = [[PQIndex.searchBatch]]: (qid, id, score),
    * (score desc, id asc) per qid. Qids must identify ONE query each —
    * a repeated qid would double every d̂ partial through the table join
    * (round-11 review), and collapsing duplicates has no defined winner
    * in a distributed plan (round-12 ADVICE: the old `dropDuplicates`
    * was a nondeterministic pick). Uniqueness is ASSERTED inside the
    * plan (a window count + assert_true filter predicate, so column
    * pruning cannot elide it and no extra driver job runs): duplicate
    * qids fail the query with a named error. */
  def searchBatch(queries: DataFrame, qidCol: String, qvecCol: String,
                  k: Int, nprobe: Int = 4,
                  broadcastQueries: Boolean = true): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    val spark = codes.sparkSession
    import spark.implicits._
    val q = queries.select(col(qidCol).as("qid"),
      col(qvecCol).cast("array<double>").as("__qv"))
      .withColumn("__nq", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))))
      .where(assert_true(col("__nq") === 1,
        concat(lit("duplicate qid in ResidualPQ.searchBatch: "),
          col("qid").cast("string"))).isNull)
      .drop("__nq")
    val cenDF = centroids.toSeq.map { case (c, cen) => (c, cen.toSeq) }
      .toDF("cluster", "cen")
    val probed = graft.plans.TopK.perKey(
      q.crossJoin(broadcast(cenDF))
        .select(col("qid"), col("cluster"),
          graft.expr.VectorExpr.squaredL2(col("__qv"), col("cen")).as("cd2")),
      Seq("qid"), Seq("cd2" -> false, "cluster" -> false), nprobe)
      .select(col("qid"), col("cluster"))
    val grid = (for {
      (c, cen) <- centroids.toSeq
      s <- 0 until m
      (bk, j) <- codebooks(s).zipWithIndex
    } yield (c, s, j, cen.slice(s * subDim, (s + 1) * subDim).toSeq, bk.toSeq))
      .toDF("cluster", "s", "code", "cen_s", "bk")
    val qd = q.join(probed, Seq("qid"))
      .join(broadcast(grid), Seq("cluster"))
      .select(col("qid"), col("cluster"), col("s"), col("code"),
        graft.expr.VectorExpr.squaredL2(
          zip_with(slice(col("__qv"), col("s") * subDim + 1, lit(subDim)),
            col("cen_s"), (a, b) => a - b),
          col("bk")).as("d2"))
    val qdSide = (df: DataFrame) =>
      if (broadcastQueries) broadcast(df) else df.hint("shuffle_hash")
    val dist = codes
      .select(col("id"), col("cluster"), posexplode(col("codes")).as(Seq("s", "code")))
      .join(qdSide(qd), Seq("cluster", "s", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d2")).as("dist"))
    graft.plans.TopK.perKey(
      dist.select(col("qid"), col("id"),
        (lit(1.0) / (lit(1.0) + col("dist"))).as("score")),
      Seq("qid"), Seq("score" -> true, "id" -> false), k)
      .orderBy(col("qid").asc, col("score").desc, col("id").asc)
  }

  /** EXACT top-k through the residual codes: pass 1 joins the exploded
    * codes to the broadcast per-cluster ADC frame and brackets each row
    * with its stored err; T = k-th smallest upper bound (+ the rounded-tie
    * slack); survivors float-rerank via one semi-join. Output contract =
    * [[ExactKNN.topK]] with the oracle's rounded-order tie semantics.
    * `restrict` (first column = id) narrows the search to an allow-list:
    * both the bound pass and the rerank see only allowed rows, so T is the
    * k-th smallest RESTRICTED upper bound — a global T over unfiltered
    * codes could sit below a restricted winner and wrongly prune it. */
  def searchExact(query: Array[Double], k: Int,
                  vectors: DataFrame, idCol: String, vecCol: String,
                  restrict: Option[DataFrame] = None): DataFrame =
    exactTopK(query, k, vectors, idCol, vecCol, restrict, rounded = true)

  /** [[searchExact]] with RAW scores and the raw tie order — bit-identical
    * to [[ExactKNN.topK]] over the same vectors (same squaredL2/distToScore
    * expressions on the rerank). The facade's `ivfpq` exact escape hatch
    * (round 12): T needs no rounding slack because every true top-k row
    * has d ≤ (k-th smallest true d) ≤ (k-th smallest dhi) = T, so the
    * dlo ≤ T survivors are a provable superset under the raw order too. */
  def searchExactRaw(query: Array[Double], k: Int,
                     vectors: DataFrame, idCol: String, vecCol: String,
                     restrict: Option[DataFrame] = None): DataFrame =
    exactTopK(query, k, vectors, idCol, vecCol, restrict, rounded = false)

  private def exactTopK(query: Array[Double], k: Int,
                        vectors: DataFrame, idCol: String, vecCol: String,
                        restrict: Option[DataFrame], rounded: Boolean): DataFrame = {
    import graft.functions.VectorFunctions
    val allow = restrict.map(r =>
      r.select(col(r.columns(0)).cast("long").as("id")))
    val bounds = allow
      .map(a => exactBounds(query).join(a, Seq("id"), "left_semi"))
      .getOrElse(exactBounds(query))
    val t0row = bounds.select(col("dhi")).orderBy(col("dhi").asc).limit(k)
      .agg(max(col("dhi"))).head()
    val base = vectors.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vector"))
    if (t0row.isNullAt(0))
      return base.select(col("id"), lit(0.0).as("score")).limit(0)
    val t0 = t0row.getDouble(0)
    val t = if (rounded) t0 + 2e-4 * (1.0 + t0) * (1.0 + t0) else t0
    val qc = VectorFunctions.vecLit(query)
    val rawScore = VectorFunctions.distToScore(
      VectorFunctions.squaredL2(col("vector"), qc))
    base.join(bounds.where(col("dlo") <= t).select(col("id")), Seq("id"), "left_semi")
      .select(col("id"),
        (if (rounded) round(rawScore, 4) else rawScore).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Bounds via ONE codegen'd projection (round 17, guide §2.4 "remove
    * shuffles outright"): the old relational d̂ exploded the codes (m rows
    * per vector), broadcast-joined a per-query 32 k-row LocalRelation and
    * re-keyed the exploded rows by id through an Exchange — a corpus×m
    * shuffle PER QUERY whose only job was summing m lookups that live on
    * the same row. The ADC table is still computed driver-side per query
    * (FAISS's per-probe discipline, nlist·m·|book| doubles) but ships as
    * one flat array literal; d̂ folds the m subspace lookups in fixed
    * s-order inside the row — no Generate, no join, no Exchange, and the
    * scan stays a single WholeStageCodegen span at ANY corpus size. The
    * superset proof is arithmetic-order-independent, and the old shuffle
    * sum's merge order was not even deterministic — the fixed fold is
    * strictly tighter pinning. Plan diff in plans/r17 (facade_ivfpq_knn,
    * knn_prefilter_ivfpq): Generate+BHJ+2×HashAggregate+Exchange → Project. */
  private def exactBounds(query: Array[Double]): DataFrame = {
    val kk = codebooks.map(_.length).max
    val maxCluster = centroids.map(_._1).max
    val flat = new Array[Double]((maxCluster + 1) * m * kk)
    for ((c, cen) <- centroids; s <- 0 until m; (book, j) <- codebooks(s).zipWithIndex) {
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val x = (query(s * subDim + i) - cen(s * subDim + i)) - book(i)
        d += x * x; i += 1
      }
      flat(c * m * kk + s * kk + j) = d
    }
    val spark = codes.sparkSession
    import spark.implicits._
    val mm = m
    val kkc = kk
    codes.select(col("id").cast("long"), col("cluster").cast("int"),
        col("codes").cast("array<int>"), col("err").cast("double"))
      .as[(Long, Int, Seq[Int], Double)]
      .mapPartitions(_.map { case (id, cluster, cs, err) =>
        var dhat = 0.0
        var s = 0
        while (s < mm) { dhat += flat(cluster * mm * kkc + s * kkc + cs(s)); s += 1 }
        val ad = math.sqrt(dhat)
        val lo = math.max(0.0, ad - err)
        (id, lo * lo, (ad + err) * (ad + err))
      })
      .toDF("id", "dlo", "dhi")
  }

  /** Pass-1 survivor count — the pruning diagnostic. */
  def exactCandidateCount(query: Array[Double], k: Int): Long = {
    val bounds = exactBounds(query)
    val t0row = bounds.select(col("dhi")).orderBy(col("dhi").asc).limit(k)
      .agg(max(col("dhi"))).head()
    if (t0row.isNullAt(0)) return 0L
    val t0 = t0row.getDouble(0)
    bounds.where(col("dlo") <= t0 + 2e-4 * (1.0 + t0) * (1.0 + t0)).count()
  }
}

object ResidualPQ {

  /** Build over an IVF index's assignments: residual r = x − centroid(x)
    * per row (centroid array in the task closure — nlist·dim doubles),
    * codebooks trained on a bounded residual SAMPLE (deterministic hash
    * order, like [[PQIndex.build]]), one distributed encode pass storing
    * (cluster, codes, err). */
  def build(ivf: IVFIndex, dim: Int, m: Int = 16, nbits: Int = 8,
            seed: Long = 42L, trainSample: Int = 10000): ResidualPQ = {
    require(dim % m == 0, s"pq_code_size $m must divide dim $dim")
    val subDim = dim / m
    val spark = ivf.assignments.sparkSession
    import spark.implicits._
    val centers: Map[Int, Array[Double]] = ivf.centroids.toMap
    val base = ivf.assignments.select(col("id").cast("long"),
        col("vector").cast("array<double>"), col("cluster").cast("int"))
      .as[(Long, Seq[Double], Int)]
    // deterministic sample → residuals on the driver for Lloyd training
    val sample = base.toDF("id", "v", "cluster")
      .orderBy(xxhash64(col("id"), lit(seed)))
      .limit(trainSample)
      .collect().map { r =>
        val v = r.getSeq[Double](1).toArray
        val cen = centers(r.getInt(2))
        Array.tabulate(dim)(i => v(i) - cen(i))
      }
    require(sample.nonEmpty, "cannot train residual PQ on an empty corpus")
    val k = math.min(1 << nbits, math.max(2, sample.length / 2))
    val codebooks = Array.tabulate(m)(s =>
      Lloyd.fit(sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim)),
        k, iters = 10, new scala.util.Random(seed + s)))
    val codes = encodeFrame(base.toDF("id", "v", "cluster"),
        ivf.centroids, codebooks, dim)
      .persist(StorageLevel.MEMORY_AND_DISK)
    new ResidualPQ(codes, ivf.centroids, codebooks, dim, Seq(codes))
  }

  /** The encode pass as a lazy frame — shared by [[build]] (cluster
    * pre-assigned by the IVF) and [[ResidualPQ.append]] (cluster = nearest
    * trained centroid, computed in the same task; ties break to the
    * lowest cluster id, deterministic). Input: (id, v[, cluster]);
    * centroids + codebooks travel in the task closure (nlist·dim +
    * m·|book|·subDim doubles). Output: (id, cluster, codes, err) with
    * err = ‖x − centroid − ĉ(residual)‖, the row-exact bound radius. */
  private[vector] def encodeFrame(base: DataFrame,
                                  centroids: Array[(Int, Array[Double])],
                                  codebooks: Array[Array[Array[Double]]],
                                  dim: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val subDim = dim / m
    val cb = codebooks
    val cens = centroids
    val centers = centroids.toMap
    val assigned: org.apache.spark.sql.Dataset[(Long, Seq[Double], Int)] =
      if (base.columns.contains("cluster"))
        base.select(col("id").cast("long"), col("v").cast("array<double>"),
          col("cluster").cast("int")).as[(Long, Seq[Double], Int)]
      else base.select(col("id").cast("long"), col("v").cast("array<double>"))
        .as[(Long, Seq[Double])].mapPartitions(_.map { case (id, v) =>
          val arr = v.toArray
          var best = cens(0)._1; var bestD = Double.MaxValue
          var ci = 0
          while (ci < cens.length) {
            val cen = cens(ci)._2
            var d = 0.0; var i = 0
            while (i < dim) { val x = arr(i) - cen(i); d += x * x; i += 1 }
            if (d < bestD) { bestD = d; best = cens(ci)._1 }
            ci += 1
          }
          (id, v, best)
        })
    assigned.mapPartitions(_.map { case (id, v, cluster) =>
      val cen = centers(cluster)
      val arr = Array.tabulate(dim)(i => v(i) - cen(i))
      var e2 = 0.0
      val cs = Array.tabulate(m) { s =>
        val off = s * subDim
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cb(s).length) {
          var d = 0.0; var i = 0
          while (i < subDim) { val x = arr(off + i) - cb(s)(c)(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        e2 += bestD
        best
      }
      (id, cluster, cs.toSeq, math.sqrt(e2))
    }).toDF("id", "cluster", "codes", "err")
  }

  // ---- persistence ([[PQIndex.save]]'s pattern + the coarse centroids:
  // the reference persists its index binary, local_db.py:219–222 — ours is
  // codes + codebooks + centroids as three parquet frames) ----

  def save(index: ResidualPQ, path: String): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    // cluster-partitioned at rest: a probe's `cluster IN (probed…)` becomes
    // file-level partition pruning — only nprobe/nlist of the codes files
    // open (the IVF assignments discipline, applied to the codes frame)
    index.codes.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/codes")
    index.codebooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) => (s, j, c.toSeq, index.dim) }
    }.toSeq.toDF("subspace", "code", "centroid", "dim")
      .write.mode("overwrite").parquet(s"$path/codebooks")
    index.centroids.toSeq.map { case (c, cen) => (c, cen.toSeq) }
      .toDF("cluster", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): ResidualPQ = {
    val cbRows = spark.read.parquet(s"$path/codebooks").collect()
    // fail fast with a diagnosable message instead of an opaque
    // NoSuchElementException on `.head` (round-12 ADVICE)
    require(cbRows.nonEmpty, s"no residual-PQ codebooks at $path/codebooks")
    val dim = cbRows.head.getInt(3)
    val codebooks = cbRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, cs) =>
      cs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
    }.toArray
    val centroids = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val codes = spark.read.parquet(s"$path/codes")
      .persist(StorageLevel.MEMORY_AND_DISK)
    new ResidualPQ(codes, centroids, codebooks, dim, Seq(codes))
  }
}
