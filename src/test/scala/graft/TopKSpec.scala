package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Differential + plan-shape tests for the custom TopKPerKey
  * physical operator (graft.plans.TopKPerKey): bounded per-key heaps
  * must produce exactly the window+filter rows without the window's
  * full per-group sort.
  */
class TopKSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("TopKPerKey == row_number window + filter, row for row") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"n_chars")
    val topk = graft.plans.TopK.perKey(docs,
      Seq("lang"), Seq("n_chars" -> false, "doc_id" -> true), 5)
    val w = Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id")
    val ref = docs.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
    assert(topk.except(ref).isEmpty && ref.except(topk).isEmpty,
      "TopKPerKey diverges from the window formulation")
  }

  test("TopKPerKey plans its own exec with no full sort") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"n_chars")
    val topk = graft.plans.TopK.perKey(docs,
      Seq("lang"), Seq("n_chars" -> false, "doc_id" -> true), 3)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), s"strategy did not plan the node:\n$plan")
    // two-phase like hash aggregation: partial before the shuffle
    // bounds shuffle volume to k rows per key per input partition
    assert(plan.contains("TopKPerKeyPartial"), s"no map-side partial phase:\n$plan")
    assert(plan.linesIterator.toSeq.indexWhere(_.contains("TopKPerKeyPartial")) >
      plan.linesIterator.toSeq.indexWhere(_.contains("Exchange hashpartitioning")),
      "partial phase must sit below the shuffle")
    assert(!plan.contains("!TopKPerKey"), s"exec reports missing input:\n$plan")
    assert(!plan.contains("Sort "),
      s"bounded heaps must replace the window's full sort:\n$plan")
    // exactly one shuffle: the ClusteredDistribution on the key
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
  }

  test("TopKPerKey handles k larger than group size and single-row groups") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("id", "g", "v")
    val topk = graft.plans.TopK.perKey(df,
      Seq("g"), Seq("v" -> false, "id" -> true), 10)
      .orderBy($"g", $"rn").collect()
    assert(topk.map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSeq ==
      Seq(("a", 2L, 1), ("a", 1L, 2), ("b", 3L, 1)))
  }
}
