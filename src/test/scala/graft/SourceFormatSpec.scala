package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source-format coverage beyond parquet: JSON lines and CSV with
  * explicit fail-fast schemas (a complete engine ingests all three),
  * plus sketch aggregates (the 100-TB form of distinct counting).
  */
class SourceFormatSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  test("JSON-lines round-trip: explicit schema, FAILFAST, same rows as parquet") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp("json")
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).option("mode", "FAILFAST").json(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("CSV round-trip: header + quoted text survive, schema enforced") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp("csv")
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(docs.schema)
      .option("header", "true").option("mode", "FAILFAST").csv(dir)
    assert(back.count() == docs.count())
    // text contains commas/punctuation — quoting must round-trip it
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("sketch aggregates: approx_count_distinct within rsd of exact; approx quantiles ordered") {
    val o = Tables.orders(spark, sf)
    val exact = o.select(countDistinct($"o_custkey")).collect()(0).getLong(0)
    val approx = o.select(approx_count_distinct($"o_custkey", 0.02))
      .collect()(0).getLong(0)
    // HLL++ at rsd=0.02: allow 5 sigma
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx=$approx exact=$exact")

    val qs = o.stat.approxQuantile("o_totalprice", Array(0.25, 0.5, 0.75), 0.01)
    assert(qs.length == 3 && qs(0) <= qs(1) && qs(1) <= qs(2))
    val (lo, hi) = (o.agg(min($"o_totalprice")).collect()(0).getDouble(0),
      o.agg(max($"o_totalprice")).collect()(0).getDouble(0))
    assert(qs.forall(q => q >= lo && q <= hi))
  }
}
