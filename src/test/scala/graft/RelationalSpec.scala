package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    // events.parquet is TIMESTAMP(NANOS) — see Tables.events
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("every relational query runs and has a stable schema") {
    for ((name, fn) <- graft.queries.Relational.queries) {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("q01 pricing summary: one row per (returnflag, linestatus)") {
    val df = graft.queries.Relational.queries("q01_pricing_summary")(spark, sf)
    val n = df.count()
    assert(n >= 4 && n <= 8, s"unexpected group count $n")
    val row = df.filter(col("l_returnflag") === "N").limit(1).collect()(0)
    assert(row.getAs[Long]("count_order") > 0)
    assert(row.getAs[Double]("sum_disc_price") < row.getAs[Double]("sum_base_price"))
  }

  test("q05 anti-join and q06 semi-join partition the customer set sensibly") {
    val anti = graft.queries.Relational.queries("q05_customers_no_orders")(spark, sf).count()
    val total = Tables.customer(spark, sf).count()
    assert(anti <= total)
  }

  test("q19 salted agg equals direct groupBy") {
    import spark.implicits._
    val salted = graft.queries.Relational.queries("q19_salted_agg")(spark, sf)
    val direct = Tables.lineitem(spark, sf)
      .groupBy($"l_suppkey")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n_items"))
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)
  }

  test("q03 top-k is deterministically ordered") {
    val rows = graft.queries.Relational.queries("q03_top_orders")(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
