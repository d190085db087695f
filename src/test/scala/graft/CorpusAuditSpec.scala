package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.CorpusAudit
import java.nio.file.Files

/** CorpusAudit (graft.pipeline) — the materialized governance report
  * must be exactly the gated queries' answers, with a manifest that
  * certifies what landed on disk.
  */
class CorpusAuditSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("audit pack: every table lands, manifest certifies disk counts, tables ≡ live queries, re-run idempotent") {
    val out = Files.createTempDirectory("graft-audit").toString + "/report"
    val manifest = CorpusAudit.run(spark, sf, out)
      .as[(String, String, Long)].collect().toSeq
    assert(manifest.map(_._1) == CorpusAudit.Tables.keys.toSeq.sorted,
      "manifest must list every table")
    manifest.foreach { case (table, query, n) =>
      val disk = CorpusAudit.readBack(spark, out, table).count()
      assert(disk == n, s"$table: manifest $n != disk $disk")
      assert(n > 0, s"$table wrote an empty report")
      // the artifact IS the gated query's answer
      val live = SparkEntry.queries(query)(spark, sf).count()
      assert(n == live, s"$table: disk $n != live query $live")
    }
    spark.catalog.clearCache()
    // spot-check full-row equality on one table
    val disk = CorpusAudit.readBack(spark, out, "zipf_slope")
      .orderBy($"lang").collect().toSeq
    val live = SparkEntry.queries("q139_zipf_slope")(spark, sf)
      .collect().toSeq
    assert(disk == live, "zipf_slope artifact diverges from the query")
    spark.catalog.clearCache()

    // re-run reproduces the identical artifact
    val again = CorpusAudit.run(spark, sf, out)
      .as[(String, String, Long)].collect().toSeq
    assert(again == manifest, "re-run changed the manifest")

    // subset + typo guards
    val sub = CorpusAudit.run(spark, sf, out + "2",
      only = Some(Set("gini_lengths")))
      .as[(String, String, Long)].collect().toSeq
    assert(sub.map(_._1) == Seq("gini_lengths"))
    val e = intercept[IllegalArgumentException] {
      CorpusAudit.run(spark, sf, out + "3", only = Some(Set("nope")))
    }
    assert(e.getMessage.contains("nope"))
  }
}
