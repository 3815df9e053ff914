package graft

import graft.dedup.Dedup
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val docs = Seq(
    0L -> base,
    1L -> (base + " extra"),                       // near-dup of 0
    2L -> base.split(" ").reverse.mkString(" "),   // same tokens, different grams
    3L -> "completely different text about spark engines and catalyst plans",
    4L -> base)                                    // exact dup of 0
    .toDF("id", "text")

  test("exactGroups finds the identical pair only") {
    val g = Dedup.exactGroups(docs, "id", "text").collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("min_id") == 0L && g.head.getAs[Long]("max_id") == 4L)
  }

  test("jaccardPairs: exact dup at 1.0, near-dup high, reversal/unrelated absent") {
    val p = Dedup.jaccardPairs(docs, "id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p((0L, 4L)) == 1.0)
    assert(p.contains((0L, 1L)) && p((0L, 1L)) > 0.9)
    assert(p.contains((1L, 4L)))
    assert(!p.keys.exists { case (a, b) => a == 2L || b == 2L || a == 3L || b == 3L })
  }

  test("minhashPairs recovers the same high-similarity pairs") {
    val p = Dedup.minhashPairs(docs, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((0L, 4L)) && p.contains((0L, 1L)))
  }

  test("simhash: identical docs get identical signatures; pairs found at hamming 0") {
    val sims = Dedup.simhash(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sims(0L) == sims(4L))
    assert(sims(0L).length == 64 && sims.values.forall(_.matches("[01]{64}")))
    // reversal has identical tf profile → identical simhash (order-insensitive)
    assert(sims(0L) == sims(2L))
    val pairs = Dedup.simhashPairs(docs, "id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 4L)) == 0L && pairs((0L, 2L)) == 0L)
  }

  test("embeddingPairs: only the near-parallel pair crosses the threshold") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.99f, 0.1f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f))).toDF("id", "v")
    val p = Dedup.embeddingPairs(emb, "id", "v", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(p.toSeq == Seq((0L, 1L)))
  }
}
