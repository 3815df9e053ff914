package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located joins — the at-rest partitioning strategy for
  * repeated large-scale joins (SCALE.md): writing both sides bucketed on
  * the join key by the same bucket count lets every subsequent join read
  * co-located buckets and skip the shuffle entirely. At 100 TB the
  * exchange IS the cost of a fact-fact join; bucketing amortizes it into
  * the one-time write. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("join of two tables bucketed on the join key runs with NO shuffle exchange") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"n_chars")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label")
    // disable broadcast: these test tables are tiny, and a broadcast join
    // is also exchange-free — it would vacuously pass without proving the
    // co-located bucket read this spec is about
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_docs")
      emb.write.bucketBy(8, "vec_id").sortBy("vec_id")
        .mode("overwrite").saveAsTable("b_emb")

      val joined = spark.table("b_docs")
        .join(spark.table("b_emb"), $"doc_id" === $"vec_id")
        .groupBy($"lang").agg(count(lit(1)).as("n"), avg($"label").as("avg_label"))

      val expected = docs.join(emb, $"doc_id" === $"vec_id")
        .groupBy($"lang").agg(count(lit(1)).as("n"), avg($"label").as("avg_label"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected)

      // the bucketed JOIN itself must be exchange-free: co-located bucket
      // reads feed the sort-merge join directly (the groupBy above the
      // join still shuffles — only the join subtree is pinned)
      val joinOnly = spark.table("b_docs")
        .join(spark.table("b_emb"), $"doc_id" === $"vec_id")
      joinOnly.count()
      val plan = joinOnly.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join plan contains an exchange:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join over bucketed scans:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_emb")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    try {
      graft.sources.Tables.documents(spark, sfDir).select($"doc_id")
        .write.bucketBy(8, "doc_id").mode("overwrite").saveAsTable("b_docs8")
      graft.sources.Tables.embeddings(spark, sfDir).select($"vec_id")
        .write.bucketBy(4, "vec_id").mode("overwrite").saveAsTable("b_emb4")
      val j = spark.table("b_docs8").join(spark.table("b_emb4"), $"doc_id" === $"vec_id")
      val n = j.count()
      assert(n == graft.sources.Tables.embeddings(spark, sfDir)
        .join(graft.sources.Tables.documents(spark, sfDir), $"vec_id" === $"doc_id").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs8")
      spark.sql("DROP TABLE IF EXISTS b_emb4")
    }
  }
}
