package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shredded-VARIANT metadata under the canonical-JSON contract (round 12,
  * r11 VERDICT #8 stretch): `save` writes a (id, mv VARIANT) side frame —
  * Spark 4.1 shreds it into per-key typed parquet columns by default —
  * and a LOADED collection serves `queryMetadata` conditions from that
  * lazy frame, compiling each condition into a pushed shredded-column
  * scan filter plus the canonical-JSON residual that preserves the
  * reference's typed equality. These tests pin: result parity with the
  * in-memory path, the PLAN (PushedFilters EqualTo on the shredded field,
  * ReadSchema pruned to it), typed-equality exactness through the
  * coercion-prone pushed arm, append invalidation, and pre-round-12
  * save compatibility. */
class VariantMetadataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 4
  private val rnd = new scala.util.Random(7)
  private def vec(): Array[Float] = Array.fill(dim)(rnd.nextFloat())

  private val docs = Seq("alpha doc", "beta doc", "gamma doc", "delta doc")
  private val vecs = Seq.fill(4)(vec())
  private val metas = Seq(
    Map[String, Any]("lang" -> "en", "amount" -> 1250.75, "n" -> 150),
    Map[String, Any]("lang" -> "fr", "amount" -> "1250.75"), // STRING amount
    Map[String, Any]("lang" -> "en", "n" -> 150L),
    Map[String, Any]("flag" -> true, "n" -> "150"))          // STRING n

  private def savedDb(f: VectorDatabase => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("variant_meta")
    try {
      val db = VectorDatabase.create(spark, dim, "flat")
      db.add(docs, vecs, Some(metas))
      db.save(dir.toString)
      db.close()
      val loaded = VectorDatabase.load(spark, dir.toString)
      try f(loaded) finally loaded.close()
    } finally graft.streaming.StreamingGates.rmrf(dir)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("loaded queryMetadata == in-memory path, and the scan pushes the shredded field") {
    savedDb { loaded =>
      val fresh = VectorDatabase.create(spark, dim, "flat")
      fresh.add(docs, vecs, Some(metas))
      try {
        for (cond <- Seq(
            Map[String, Any]("lang" -> "en"),
            Map[String, Any]("amount" -> 1250.75),
            Map[String, Any]("n" -> 150),
            Map[String, Any]("flag" -> true),
            Map[String, Any]("lang" -> "en", "n" -> 150))) {
          assert(ids(loaded.queryMetadata(cond)) == ids(fresh.queryMetadata(cond)),
            s"variant path diverged on $cond")
        }
      } finally fresh.close()
      // the condition plan: a pushed EqualTo on the shredded typed column,
      // ReadSchema pruned to that field — not the whole variant binary
      val plan = loaded.queryMetadata(Map("lang" -> "en"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(mv."),
        s"no pushed shredded filter in:\n$plan")
      assert(plan.contains("mv:struct<"),
        s"ReadSchema not pruned to shredded fields in:\n$plan")
    }
  }

  test("typed equality survives the coercion-prone pushed arm") {
    savedDb { loaded =>
      // numeric 1250.75 matches ONLY the doubles (ids 0), never the string
      assert(ids(loaded.queryMetadata(Map("amount" -> 1250.75))) == Seq(0L))
      // string "1250.75" matches ONLY the string (id 1) — the pushed
      // double→string / string→double casts coerce, the residual rejects
      assert(ids(loaded.queryMetadata(Map("amount" -> "1250.75"))) == Seq(1L))
      // int 150 matches the numerics (0: Int, 2: Long), not the string "150"
      assert(ids(loaded.queryMetadata(Map("n" -> 150))) == Seq(0L, 2L))
      assert(ids(loaded.queryMetadata(Map("n" -> "150"))) == Seq(3L))
    }
  }

  test("append invalidates the save-time snapshot; results stay correct") {
    savedDb { loaded =>
      loaded.add(Seq("epsilon doc"), Seq(vec()),
        Some(Seq(Map[String, Any]("lang" -> "en"))))
      val got = ids(loaded.queryMetadata(Map("lang" -> "en")))
      assert(got == Seq(0L, 2L, 4L), s"appended row missing: $got")
      // and the fallback plan no longer reads the side parquet
      val plan = loaded.queryMetadata(Map("lang" -> "en"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("meta_variant"), "stale side frame still in plan")
    }
  }

  test("pre-round-12 saves (no side frame) load and answer via the canonical path") {
    val dir = java.nio.file.Files.createTempDirectory("variant_meta_old")
    try {
      val db = VectorDatabase.create(spark, dim, "flat")
      db.add(docs, vecs, Some(metas))
      db.save(dir.toString)
      db.close()
      graft.streaming.StreamingGates.rmrf(dir.resolve("meta_variant"))
      val loaded = VectorDatabase.load(spark, dir.toString)
      try assert(ids(loaded.queryMetadata(Map("lang" -> "en"))) == Seq(0L, 2L))
      finally loaded.close()
    } finally graft.streaming.StreamingGates.rmrf(dir)
  }
}
