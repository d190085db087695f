package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Differential + plan-shape tests for the custom TopKPerKey
  * physical operator (graft.plans.TopKPerKey): bounded per-key heaps
  * must produce exactly the window+filter rows without ever sorting
  * the raw input.
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

  test("TopKPerKey plans its own exec; only the shuffled survivors are sorted") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"n_chars")
    val topk = graft.plans.TopK.perKey(docs,
      Seq("lang"), Seq("n_chars" -> false, "doc_id" -> true), 3)
    val lines = topk.queryExecution.executedPlan.toString.linesIterator.toSeq
    val plan = lines.mkString("\n")
    def at(marker: String): Int = lines.indexWhere(_.contains(marker))
    assert(plan.contains("TopKPerKey "), s"strategy did not plan the node:\n$plan")
    // two-phase like hash aggregation: partial before the shuffle
    // bounds shuffle volume to k rows per key per input partition
    assert(plan.contains("TopKPerKeyPartial"), s"no map-side partial phase:\n$plan")
    assert(at("TopKPerKeyPartial") > at("Exchange hashpartitioning"),
      "partial phase must sit below the shuffle")
    assert(!plan.contains("!TopKPerKey"), s"exec reports missing input:\n$plan")
    // the final phase's required (key, order) ordering is satisfied by
    // a spill-capable SortExec ABOVE the exchange — it sorts only the
    // partial phase's ≤ k-rows-per-key-per-partition survivors; the
    // raw input below the shuffle must never be sorted
    val sortAt = at("Sort ")
    assert(sortAt >= 0 && sortAt < at("Exchange hashpartitioning"),
      s"survivor sort must sit between final phase and shuffle:\n$plan")
    assert(!lines.drop(at("Exchange hashpartitioning")).exists(_.contains("Sort ")),
      s"input side of the shuffle must not sort:\n$plan")
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

  test("partial-phase flush fallback keeps results exact under a tiny row budget") {
    // force a flush every handful of rows: high key cardinality no
    // longer accumulates unbounded heap state, and the result must
    // still match the window formulation row for row
    spark.conf.set("spark.graft.topk.partialFlushRows", "7")
    try {
      val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"n_chars")
      val topk = graft.plans.TopK.perKey(docs,
        Seq("lang"), Seq("n_chars" -> false, "doc_id" -> true), 5)
      val w = Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id")
      val ref = docs.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      assert(topk.except(ref).isEmpty && ref.except(topk).isEmpty,
        "flushing the partial heaps changed the result")
    } finally spark.conf.unset("spark.graft.topk.partialFlushRows")
  }

  test("WindowTopKRewrite: the standard row_number+filter idiom plans TopKPerKey") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"n_chars")
    val w = Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id")
    val idiom = docs.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
    val plan = idiom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("Window"),
      s"rewrite did not replace the window:\n$plan")
    // and the rewritten plan returns exactly the un-rewritten rows
    spark.conf.set("spark.graft.topk.rewrite", "false")
    try {
      val off = docs.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      assert(!off.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "kill switch ignored")
      assert(idiom.except(off).isEmpty && off.except(idiom).isEmpty,
        "rewritten result diverges from the window result")
    } finally spark.conf.unset("spark.graft.topk.rewrite")
    // q09 ships the idiom — its executed plan must be on the operator
    val q09 = graft.queries.Relational.queries("q09_latest_orders")(spark, sf)
    assert(q09.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "q09's window formulation was not rewritten onto TopKPerKey")
  }

  test("WindowTopKRewrite: rn = k keeps a residual filter; other window functions bail") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"n_chars")
    val w = Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id")
    // equality form: bounded by k, residual filter keeps only rank k
    val second = docs.withColumn("rn", row_number().over(w)).filter($"rn" === 2)
    assert(second.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val ref = docs.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .filter($"rn" === 2)
    assert(second.except(ref).isEmpty && ref.except(second).isEmpty)
    // rank() has different semantics than row_number — must not fire
    val ranked = docs.withColumn("rn", rank().over(w)).filter($"rn" <= 2)
    assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "rewrite fired on rank(), which ties differently")
    // a second window expression rides the same Window node — bail
    val two = docs
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max($"n_chars").over(Window.partitionBy($"lang")))
      .filter($"rn" <= 2)
    assert(two.count() > 0) // plans and runs, whichever shape it takes
  }

  test("TopKPerKey shuffles O(keys·k) rows where the window shuffles everything") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import java.util.concurrent.atomic.AtomicLong
    val shuffled = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffled.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def measure(f: => Unit): Long = {
      spark.sparkContext.addSparkListener(listener)
      shuffled.set(0)
      try { f; org.apache.spark.ListenerShim.flush(spark.sparkContext) }
      finally spark.sparkContext.removeSparkListener(listener)
      shuffled.get()
    }
    // spread the 500 docs over several input partitions so the
    // partial phase has real map-side work to cut
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"n_chars").repartition(4, $"doc_id")
    val n = docs.count()
    val w = Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id")

    // the plain window cost (Spark's own InferWindowGroupLimit also
    // map-side-prunes rank filters — but only after LOCALLY SORTING
    // every input row; disable it to measure the naive baseline the
    // heaps replace. Against WindowGroupLimit itself the operator's
    // edge is O(n log k) hash heaps instead of an O(n log n) local
    // sort + equal shuffle volume.)
    spark.conf.set("spark.graft.topk.rewrite", "false")
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    val windowShuffle = try measure {
      docs.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
        .foreach(_ => ())
    } finally {
      spark.conf.unset("spark.graft.topk.rewrite")
      spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
    }

    val topkShuffle = measure {
      graft.plans.TopK.perKey(docs, Seq("lang"),
        Seq("n_chars" -> false, "doc_id" -> true), 5).foreach(_ => ())
    }
    val nLangs = docs.select($"lang").distinct().count()
    // window: every row crosses the exchange (plus the repartition);
    // operator: at most keys × k × map-partitions survivors do
    val bound = nLangs * 5 * 4 + n // + n for the shared repartition
    assert(windowShuffle >= 2 * n,
      s"window formulation shuffled $windowShuffle rows, expected ≥ ${2 * n}")
    assert(topkShuffle <= bound,
      s"TopKPerKey shuffled $topkShuffle rows, bound $bound")
    assert(topkShuffle < windowShuffle,
      s"operator ($topkShuffle) did not beat the window ($windowShuffle)")
  }

  test("TopKPerKey rejects a rank-column name collision") {
    val df = Seq((1L, "a", 2)).toDF("id", "g", "rn")
    val e = intercept[IllegalArgumentException] {
      graft.plans.TopK.perKey(df, Seq("g"), Seq("id" -> true), 1)
    }
    assert(e.getMessage.contains("rankCol"))
    // and an explicit rankCol resolves the collision
    val ok = graft.plans.TopK.perKey(df, Seq("g"), Seq("id" -> true), 1,
      rankCol = "rank2")
    assert(ok.columns.toSeq == Seq("id", "g", "rn", "rank2"))
  }
}
