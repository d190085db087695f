package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.CorpusStatsMaintenance
import java.nio.file.Files

/** CorpusStatsMaintenance — the incremental term-count store must
  * serve the gated lexical statistics EXACTLY (same integers as the
  * batch chains over the union of everything absorbed), stay
  * idempotent under re-delivery, and be invisible to consumers
  * across compaction.
  */
class CorpusStatsMaintenanceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("incremental store serves q139/q140/q152 exactly, re-delivery idempotent, compaction invisible, token-less no-op") {
    val dir = Files.createTempDirectory("graft-cstats").toString + "/store"
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text")
    val part0 = docs.filter(pmod($"doc_id", lit(3L)) === 0L)
    val part1 = docs.filter(pmod($"doc_id", lit(3L)) === 1L)
    val part2 = docs.filter(pmod($"doc_id", lit(3L)) === 2L)

    CorpusStatsMaintenance.build(spark, part0, dir)
    CorpusStatsMaintenance.absorb(spark, part1, dir, "b1")
    CorpusStatsMaintenance.absorb(spark, part2, dir, "b2")

    def served = (
      CorpusStatsMaintenance.lexicalDiversity(spark, dir).collect().toSeq,
      CorpusStatsMaintenance.goodTuring(spark, dir).collect().toSeq,
      CorpusStatsMaintenance.zipfSlope(spark, dir).collect().toSeq)
    val batch = (
      graft.queries.Corpus.lexicalDiversity(docs).collect().toSeq,
      graft.queries.Corpus.goodTuring(docs).collect().toSeq,
      graft.queries.Corpus.zipfSlope(docs).collect().toSeq)
    assert(batch._1.nonEmpty && batch._3.nonEmpty, "fixture served nothing")
    assert(served == batch,
      "served statistics diverge from the batch chains over the same docs")

    // at-least-once: a re-delivered batch overwrites its own run
    CorpusStatsMaintenance.absorb(spark, part1, dir, "b1")
    assert(served == batch, "re-delivery changed the served statistics")

    // a token-less delivery writes nothing and serves unchanged
    CorpusStatsMaintenance.absorb(spark,
      Seq((999999L, "en", "")).toDF("doc_id", "lang", "text"), dir, "b3")
    assert(served == batch, "token-less delivery changed the store")

    // compaction folds the runs into one partition without changing
    // a single served integer
    val root = new org.apache.hadoop.fs.Path(s"$dir/termcounts")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def runDirs = fs.listStatus(root)
      .count(s => s.isDirectory && s.getPath.getName.startsWith("run="))
    assert(runDirs == 3, s"expected 3 run partitions before compaction, got $runDirs")
    CorpusStatsMaintenance.compact(spark, dir)
    assert(runDirs == 1, "compaction must fold to one partition")
    assert(served == batch, "compaction changed the served statistics")

    // and the store keeps absorbing after a fold
    CorpusStatsMaintenance.absorb(spark,
      Seq((999998L, "en", "freshword freshword")).toDF("doc_id", "lang", "text"),
      dir, "b4")
    val extended = docs.unionByName(Seq((999998L, "en", "freshword freshword"))
      .toDF("doc_id", "lang", "text"))
    assert(served._2 == graft.queries.Corpus.goodTuring(extended).collect().toSeq,
      "post-compaction absorb diverges from the batch chain")
  }
}
