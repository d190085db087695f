package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.CurationExport
import java.nio.file.Files

/** CurationExport (graft.pipeline) — the materialized end product
  * must agree with the queries that define its stages: q67's keep
  * counts, q65's leakage-safety, and idempotent re-runs.
  */
class CurationExportSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("export agrees with q67 keep counts, is leakage-safe, and re-runs idempotently") {
    val outDir = Files.createTempDirectory("graft-export").toString + "/corpus"
    CurationExport.run(spark, sf, outDir)

    // stage agreement: per-language survivor counts == q67's report
    val got = spark.read.parquet(outDir)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val want = SparkEntry.queries("q67_dedup_keep")(spark, sf)
      .select($"lang", $"n_kept").as[(String, Long)].collect().toMap
    assert(got == want, s"export counts diverge from q67: $got vs $want")

    // leakage-safety: no near-dup pair straddles splits (q65's law,
    // re-checked on the WRITTEN artifact)
    val split = spark.read.parquet(outDir)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val pairs = SparkEntry.queries("q24_near_dup")(spark, sf)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      (split.get(a), split.get(b)) match {
        case (Some(sa), Some(sb)) =>
          assert(sa == sb, s"near-dup pair ($a,$b) straddles $sa/$sb")
        case _ => () // at most the representative survives — fine
      }
    }

    // idempotence: a second run rewrites the same artifact
    val first = spark.read.parquet(outDir).count()
    CurationExport.run(spark, sf, outDir)
    assert(spark.read.parquet(outDir).count() == first)

    // split covers all survivors roughly 80/10/10
    val n = split.size
    val train = split.values.count(_ == "train").toDouble / n
    assert(train > 0.6 && train < 0.95, s"train fraction $train implausible")
  }

  test("jsonl export round-trips the parquet artifact exactly (one document per line)") {
    val root = Files.createTempDirectory("graft-export-jsonl").toString
    val pq = s"$root/pq"; val jl = s"$root/jl"
    val rep1 = CurationExport.run(spark, sf, pq).collect()
    val rep2 = CurationExport.run(spark, sf, jl, format = "jsonl").collect()
    assert(rep1.sameElements(rep2), "per-split reports diverge across formats")
    // full-row equality: same docs, same text bytes, same lineage
    def rows(dir: String, fmt: String) =
      CurationExport.readBack(spark, dir, fmt)
        .select($"doc_id", $"lang", $"text", $"unit_id", $"quality", $"split")
        .as[(Long, String, String, Long, Double, String)]
        .collect().sortBy(_._1)
    val a = rows(pq, "parquet"); val b = rows(jl, "jsonl")
    assert(a.length == b.length && a.sameElements(b),
      "jsonl round-trip diverges from the parquet artifact")
    // the format contract: every data file is valid JSON Lines — as
    // many lines as rows, each parsing independently
    val files = new java.io.File(jl).listFiles().filter(_.getName.startsWith("split="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty, "no .json part files written")
    val lineCount = files.map(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().size).sum
    assert(lineCount == a.length,
      s"line count $lineCount != ${a.length} docs — a text newline leaked unescaped")
  }
}
