package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Differential + plan-shape + edge-case tests for the custom
  * sort-merge as-of join (graft.plans.AsOfJoin).
  */
class AsOfSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("AsOfJoin == tag+union+window formulation on real tables, row for row") {
    val o = Tables.orders(spark, sf)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(sum($"o_totalprice").as("day_total"))
      .select($"o_custkey".as("k"),
        unix_millis($"o_orderdate".cast("timestamp")).as("t"), $"day_total")
    val e = Tables.events(spark, sf)
      .select($"event_id", $"user_id".as("k"), unix_millis($"ts").as("t"))

    val custom = graft.plans.AsOf.joinBackward(e, o, Seq("k"), "t")
      .select($"event_id", $"k", $"day_total")

    // reference: the union+window carry-forward (q36's original form)
    val oT = o.select($"k", $"t", lit(0).as("tag"),
      lit(null).cast("bigint").as("event_id"), $"day_total")
    val eT = e.select($"k", $"t", lit(1).as("tag"), $"event_id",
      lit(null).cast("double").as("day_total"))
    val w = Window.partitionBy($"k").orderBy($"t", $"tag")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = oT.unionByName(eT)
      .withColumn("asof", last($"day_total", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", $"k", $"asof".as("day_total"))

    assert(custom.except(ref).isEmpty && ref.except(custom).isEmpty,
      "custom as-of join diverges from the window formulation")
  }

  test("edge semantics: inclusive ties, no-match nulls, stale right rows, later-only right rows") {
    val left = Seq(
      (1L, 10L, "l-a"),  // tie with right at t=10 → inclusive match
      (1L, 5L, "l-b"),   // before any right row of key 1 → null
      (2L, 100L, "l-c"), // key with no right rows at all → null
      (3L, 50L, "l-d"),  // after both right rows of key 3 → latest wins
      (3L, 12L, "l-e")   // between the two → earlier one
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 10L, "r1@10"),
      (3L, 11L, "r3@11"),
      (3L, 20L, "r3@20"),
      (4L, 1L, "r4@1")   // key never asked for → ignored
    ).toDF("k", "t", "rv")

    val out = graft.plans.AsOf.joinBackward(left, right, Seq("k"), "t")
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    assert(out == Map(
      "l-a" -> Some("r1@10"),
      "l-b" -> None,
      "l-c" -> None,
      "l-d" -> Some("r3@20"),
      "l-e" -> Some("r3@11")))
  }

  test("forward direction: inclusive ties, first-at-or-after, no-match nulls") {
    val left = Seq(
      (1L, 10L, "l-a"),  // tie with right at t=10 → inclusive match
      (1L, 11L, "l-b"),  // after the last right row of key 1 → null
      (1L, 1L, "l-c"),   // before both → earliest right row
      (2L, 7L, "l-d")    // key with no right rows → null
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 5L, "r1@5"),
      (1L, 10L, "r1@10")
    ).toDF("k", "t", "rv")

    val out = graft.plans.AsOf.joinForward(left, right, Seq("k"), "t")
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    assert(out == Map(
      "l-a" -> Some("r1@10"),
      "l-b" -> None,
      "l-c" -> Some("r1@5"),
      "l-d" -> None))
  }

  test("plan shape: custom exec, co-partitioned exchanges, spill-capable sorts, no join blowup") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "y")).toDF("k", "t", "rv")
    val df = graft.plans.AsOf.joinBackward(left, right, Seq("k"), "t")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"strategy did not plan the node:\n$plan")
    assert(!plan.contains("!AsOfJoin"), s"exec reports missing input:\n$plan")
    // both sides shuffle on the key and sort on (key, time) — the
    // SortMergeJoin shape, not a range/cartesian blowup
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 co-partitioning exchanges, got $exchanges:\n$plan")
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts >= 2, s"expected sorts satisfying (key,time) on both sides:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"as-of must not fall back to a generic join:\n$plan")
  }

  test("randomized differential: both directions match a brute-force reference on adversarial data") {
    // seeded random datasets with few keys and coarse times, so
    // duplicate (key,time) collisions, empty keys, and cross-
    // partition boundaries all occur; right times are made UNIQUE
    // per key (the operator takes the last qualifying right row in
    // sort order — with duplicate right times that tie-break is
    // partition-layout-dependent, which is why the API contract
    // requires a unique (key,time) on the right side, as q36's
    // groupBy guarantees)
    val rnd = new scala.util.Random(20260812L)
    val leftRows = Seq.fill(300)((rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, rnd.nextInt(10000)))
    val rightRows = Seq.fill(200)((rnd.nextInt(14).toLong, rnd.nextInt(40).toLong, rnd.nextInt(10000)))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val left = leftRows.toDF("k", "t", "lv").repartition(7)
    val right = rightRows.toDF("k", "t", "rv").repartition(5)

    def brute(fwd: Boolean): Map[(Long, Long, Int), Option[Int]] =
      leftRows.map { case (k, t, lv) =>
        val cands = rightRows.filter(r => r._1 == k && (if (fwd) r._2 >= t else r._2 <= t))
        val pick = if (cands.isEmpty) None
          else Some(if (fwd) cands.minBy(_._2) else cands.maxBy(_._2))
        (k, t, lv) -> pick.map(_._3)
      }.toMap

    // left rows are not unique either — compare as multisets keyed
    // by the full left row plus the joined value
    def run(fwd: Boolean): Seq[((Long, Long, Int), Option[Int])] = {
      val df = if (fwd) graft.plans.AsOf.joinForward(left, right, Seq("k"), "t")
        else graft.plans.AsOf.joinBackward(left, right, Seq("k"), "t")
      df.select($"k", $"t", $"lv", $"rv").as[(Long, Long, Int, Option[Int])]
        .collect().toSeq.map(r => ((r._1, r._2, r._3), r._4))
    }
    for (fwd <- Seq(false, true)) {
      val expected = brute(fwd)
      val got = run(fwd)
      assert(got.length == leftRows.length, s"fwd=$fwd row count")
      got.foreach { case (key, v) =>
        assert(v == expected(key), s"fwd=$fwd: left row $key got $v want ${expected(key)}")
      }
    }
  }

  test("AQE partition coalescing keeps both as-of shuffles co-partitioned (sides of very different size)") {
    // aggressive coalescing + wildly asymmetric sides: if AQE ever
    // coalesced the two exchanges independently, zipPartitions would
    // throw on unequal partition counts; if co-partitioning broke,
    // equal keys would miss and rows would lose their matches
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      val left = (0L until 20000L).map(i => (i % 50, i % 997, i)).toDF("k", "t", "lv")
      val right = (0L until 50L).map(i => (i, 0L, i * 1000)).toDF("k", "t", "rv")
      val out = graft.plans.AsOf.joinBackward(left, right, Seq("k"), "t")
      // every left row's key has a right row at t=0 <= any left t →
      // zero misses proves equal keys still meet post-coalescing
      assert(out.count() == 20000L)
      assert(out.filter($"rv".isNull).count() == 0,
        "co-partitioning broke: some keys missed their right rows")
      assert(out.filter($"rv" =!= $"k" * 1000).count() == 0)
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("validation: missing columns and payload collisions fail fast") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "v")
    val right = Seq((1L, 5L, "y")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      graft.plans.AsOf.joinBackward(left, right, Seq("nope"), "t")
    }
    // both sides carry a payload column named v → ambiguous output
    intercept[IllegalArgumentException] {
      graft.plans.AsOf.joinBackward(left, right, Seq("k"), "t")
    }
  }
}
