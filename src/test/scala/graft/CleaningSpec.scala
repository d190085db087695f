package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-6 cleaning operators: NFC kernel semantics, the q73
  * normalization chain on planted markup, and the q75 paragraph
  * dedup on planted duplicates (first-occurrence, within-doc and
  * cross-doc, reassembly order).
  */
class CleaningSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def nfc1(s: String): String =
    Seq(s).toDF("t")
      .select(graft.ops.expressions.NfcNormalize($"t").as("n"))
      .collect()(0).getString(0)

  test("NFC kernel: combining sequence composes, precomposed/ASCII unchanged, idempotent") {
    val combining = "café"     // e + U+0301
    val precomposed = "café"    // é
    assert(nfc1(combining) == precomposed)
    assert(nfc1(precomposed) == precomposed)
    assert(nfc1("plain ascii") == "plain ascii")
    assert(nfc1(nfc1(combining)) == precomposed)
    // null propagates (UnaryExpression default null handling)
    val n = Seq[String](null).toDF("t")
      .select(graft.ops.expressions.NfcNormalize($"t")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("nfc_normalize is callable from SQL and agrees with the Column API") {
    val viaSql = spark.sql("SELECT nfc_normalize('café') AS n")
      .collect()(0).getString(0)
    assert(viaSql == "café")
  }

  test("q73 chain on planted markup: tags stripped, entities decoded, whitespace collapsed") {
    // mirror of the q73 clean chain over a hand-built dirty string
    val dirty = "<p id=\"7\"> x &amp;\t<b>y</b>  z </p>\n<div>café &lt;s&gt;</div>"
    val Ws = graft.ops.TextOps.WsClass
    val out = Seq(dirty).toDF("dirty")
      .select(trim(regexp_replace(
        graft.ops.expressions.NfcNormalize(
          replace(replace(replace(
            regexp_replace($"dirty", "<[^>]*>", " "),
            lit("&lt;"), lit("<")), lit("&gt;"), lit(">")), lit("&amp;"), lit("&"))),
        s"[$Ws]+", " ")).as("clean"))
      .collect()(0).getString(0)
    assert(out == "x & y z café <s>")
  }

  test("paragraph dedup keeps first occurrence only — within-doc and cross-doc — and reassembles in order") {
    // doc 1: "a b | c d | a b" (self-repeat) — doc 2: "c d | e f" (cross-doc dup)
    val paras = Seq(
      (1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "a b"),
      (2L, 0, "c d"), (2L, 1, "e f")
    ).toDF("doc_id", "pos", "para")
    val w = Window
      .partitionBy(graft.ops.expressions.TextPolyHash($"para"), $"para")
      .orderBy($"doc_id", $"pos")
    val kept = paras.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val rebuilt = kept.groupBy($"doc_id").agg(
      array_join(transform(sort_array(collect_list(struct($"pos", $"para"))),
        p => p.getField("para")), " ").as("clean_text"))
      .orderBy($"doc_id").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(rebuilt.toSeq == Seq(1L -> "a b c d", 2L -> "e f"))
  }

  test("q73/q74/q75 run end-to-end on the sf tables with sane shapes") {
    val norm = SparkEntry.queries("q73_normalize")(spark, sf).collect()
    assert(norm.nonEmpty)
    // cleaning only ever shrinks the derived dirty text
    assert(norm.forall(r => r.getInt(2) <= r.getInt(1)))
    // é must have composed: clean text contains the precomposed char
    assert(norm.forall(_.getString(3).contains("café")))

    val urls = SparkEntry.queries("q74_url_extract")(spark, sf).collect()
    assert(urls.nonEmpty)
    // the blocklisted tracker apex never survives the anti-join
    assert(!urls.exists(_.getString(1) == "adsite.io"))

    val dedup = SparkEntry.queries("q75_paragraph_dedup")(spark, sf).collect()
    assert(dedup.nonEmpty)
    assert(dedup.forall(r => r.getLong(2) <= r.getLong(1)))
    // at least one paragraph must actually have been dropped
    assert(dedup.map(r => r.getLong(1) - r.getLong(2)).sum > 0)
  }
}
