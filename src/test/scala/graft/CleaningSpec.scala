package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

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
    // ParaTokens=3 chunks — doc 1: "a b x | c d y | a b x"
    // (self-repeat), doc 2: "c d y | e f z" (cross-doc dup)
    val docs = Seq(
      (1L, "a b x c d y a b x"),
      (2L, "c d y e f z")
    ).toDF("doc_id", "text")
    val out = graft.queries.Cleaning.paragraphDedup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, "a b x c d y"),
      (2L, 2L, 1L, "e f z")))
  }

  test("paragraph dedup survives planted skew: one paragraph in most of the corpus") {
    // the round-9 verdict's failure shape: a boilerplate paragraph in
    // >50% of docs. Correctness here; PlanAuditSpec pins the plan
    // shape (no content-key window, so no single-reducer sort).
    val boiler = "all rights reserved"            // one 3-token paragraph
    val docs = (1L to 200L).map { i =>
      val unique = s"u${i}a u${i}b u${i}c"
      if (i % 2 == 1) (i, s"$boiler $unique") else (i, unique)
    }.toDF("doc_id", "text")
    val out = graft.queries.Cleaning.paragraphDedup(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 (first in (doc_id, pos) order) keeps the boilerplate
    assert(out(1L) == ((2L, 2L, s"$boiler u1a u1b u1c")))
    // every later odd doc drops exactly the boilerplate paragraph
    for (i <- 3L to 199L by 2)
      assert(out(i) == ((2L, 1L, s"u${i}a u${i}b u${i}c")), s"doc $i: ${out(i)}")
    // even docs (no boilerplate) are untouched
    for (i <- 2L to 200L by 2)
      assert(out(i) == ((1L, 1L, s"u${i}a u${i}b u${i}c")), s"doc $i: ${out(i)}")
  }

  test("span dedup survives planted skew: one span in most of the corpus") {
    def ws(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    val span = ws("s", 1, 10)                     // 10 tokens ≥ SpanK=8
    val docs = (1L to 100L).map { i =>
      val unique = ws(s"u${i}x", 1, 10)
      if (i <= 60) (i, s"$span $unique") else (i, unique)
    }.toDF("doc_id", "text")
    val out = graft.queries.Cleaning.spanDedup(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((20L, 0L, s"$span ${ws("u1x", 1, 10)}")))
    for (i <- 2L to 60L)
      assert(out(i) == ((20L, 10L, ws(s"u${i}x", 1, 10))), s"doc $i: ${out(i)}")
    for (i <- 61L to 100L)
      assert(out(i) == ((10L, 0L, ws(s"u${i}x", 1, 10))), s"doc $i: ${out(i)}")
  }

  test("decontamination finds planted eval spans in donors, copies and embedders — and nowhere else") {
    def ws(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    // q121 derives its eval set from the 3 LONGEST docs, span =
    // tokens 4..19. Plant: donors 1-3 (longest), doc 10 = exact copy
    // of donor 1, doc 11 embeds donor 2's eval span mid-text, docs
    // 20+ unrelated. The scan must flag (eval, donor) for all three,
    // plus (eval1, 10) and (eval2, 11), and nothing else.
    val donors = (1L to 3L).map(i => (i, ws(s"d$i", 1, 40)))
    val copy = Seq((10L, ws("d1", 1, 40)))
    val span2 = ws("d2", 4, 19) // donor 2's eval span (tokens 4..19)
    val embedder = Seq((11L, ws("x", 1, 6) + " " + span2 + " " + ws("y", 1, 6)))
    val noise = (20L to 30L).map(i => (i, ws(s"n$i", 1, 20)))
    val docs = (donors ++ copy ++ embedder ++ noise).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val got = graft.queries.Cleaning.decontamination(docs)
      .select(col("eval_id"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 2L), (3L, 3L), (1L, 10L), (2L, 11L)),
      s"contamination set wrong: $got")
    // the shared-gram count is the span's full gram set for an exact
    // copy: 16-token span -> 9 distinct 8-grams
    val full = graft.queries.Cleaning.decontamination(docs)
      .filter(col("eval_id") === 2L && col("doc_id") === 11L)
      .select(col("n_shared")).as[Long].head()
    assert(full == 9L, s"embedded span should share all 9 grams, got $full")
  }

  test("semantic contamination scans the same benchmark and ranks each donor first") {
    def ws(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    // the q121 fixture SHAPE with the SAME derived eval set
    // (decontEvalItems — one definition), the embedding screen
    // instead of the n-gram scan. Each eval span is lifted from its
    // donor, so the donor's bag-of-words contains the whole span
    // vocabulary — the semantic screen must put the donor at rank 1
    // for its own eval id (the exact copy, doc 10, ties donor 1's
    // embedding bit-for-bit and sits behind on the doc_id tiebreak).
    // Stems are equal-LENGTH (so the longest-3 eval derivation picks
    // docs 1-3 on the doc_id tie-break, q121's device) but
    // hash-DIVERSE: sequential stems like "d14"/"d15" polyhash into
    // one narrow band, the stand-in FeatureEmbed then maps every doc
    // nearly collinear (cos ≈ 0.9999989 measured), and the screen
    // degenerates — an adversarial-vocabulary caveat of the
    // bag-of-hashes encoder, documented here deliberately.
    val stems = Map(1L -> "kumquat", 2L -> "zebraic", 3L -> "pilgrim")
    val donors = (1L to 3L).map(i => (i, ws(stems(i), 1, 40)))
    val copy = Seq((10L, ws(stems(1L), 1, 40)))
    val noise = (20L to 30L).map(i => (i, ws(s"junk${i}x", 1, 20)))
    val docs = (donors ++ copy ++ noise).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val out = graft.queries.Search.semanticContam(
        docs, graft.queries.Cleaning.decontEvalItems(docs))
      .select(col("eval_id"), col("doc_id"), col("rn"))
      .as[(Long, Long, Long)].collect().toSeq
    val top = out.filter(_._3 == 1L).map(t => t._1 -> t._2).toMap
    // eval 1's donor shares its exact embedding with the copy —
    // doc_id tiebreak puts the donor (1) above the copy (10)
    assert(top == Map(1L -> 1L, 2L -> 2L, 3L -> 3L),
      s"donors must rank first for their own spans: $out")
    // the exact copy sits immediately behind donor 1
    assert(out.contains((1L, 10L, 2L)),
      s"the exact copy must rank #2 for eval 1: $out")
  }

  test("n-gram novelty: template docs score 0, unique docs 1e6, short docs null") {
    def ws(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    val template = ws("t", 1, 12)
    val docs = Seq(
      (1L, template), (2L, template), (3L, template), // boilerplate family
      (4L, ws("u", 1, 12)),                           // fully novel
      (5L, ws("v", 1, 7)),                            // too short for an 8-gram
      (6L, template + " " + ws("w", 1, 8))            // half template, half novel
    ).toDF("doc_id", "text")
    val out = graft.queries.Corpus.ngramNovelty(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(1L) == ((5L, 5L, 0L)) && out(2L) == out(1L) && out(3L) == out(1L),
      s"template docs must share every gram: ${out(1L)}")
    assert(out(4L) == ((5L, 0L, 1000000L)), s"novel doc: ${out(4L)}")
    assert(out(5L) == ((0L, 0L, -1L)), s"short doc must be null-scoped: ${out(5L)}")
    // doc 6: 20 tokens -> 13 grams; the 5 pure-template grams are
    // shared, the 8 straddling-or-new grams are unique to doc 6
    assert(out(6L)._1 == 13L && out(6L)._2 == 5L, s"mixed doc: ${out(6L)}")
    spark.catalog.clearCache() // ngramNovelty persist contract
  }

  test("boilerplate gram table: cross-doc template tops the report, within-doc repeats excluded") {
    def ws(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    val template = ws("t", 1, 8) // exactly one 8-gram
    val docs = Seq(
      (1L, template + " " + ws("a", 1, 4)),
      (2L, ws("b", 1, 4) + " " + template),
      (3L, template),
      (4L, ws("r", 1, 8) + " " + ws("r", 1, 8)), // within-doc repeat only
      (5L, ws("u", 1, 20))                       // unique grams
    ).toDF("doc_id", "text")
    val out = graft.queries.Cleaning.boilerplateGrams(docs)
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty && out.head == ((template, 3L, 3L)),
      s"template must top the table: ${out.toSeq}")
    assert(out.forall(_._2 > 1), "n_docs == 1 rows must be excluded")
    assert(!out.exists(_._1.startsWith("r1 ")),
      "a within-doc repeat is not cross-doc boilerplate")
  }

  test("PII scrub: multi-PII docs count and mask exactly, clean text untouched") {
    val docs = Seq(
      (1L, "write to ann.b@corp.example.com or bob9@x.co soon call +1-555-0199 ok"),
      (2L, "no pii here at all"),
      (3L, "+44-202-555 overseas and u7@mail.example.com")
    ).toDF("doc_id", "text")
    val out = graft.queries.Cleaning.piiScrub(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def h(s: String): Long =
      Seq(Tuple1(s)).toDF("t")
        .select(graft.ops.TextOps.fingerprint(col("t"))).as[Long].head()
    assert(out(1L)._1 == 2L && out(1L)._2 == 1L, s"doc 1 counts: ${out(1L)}")
    assert(out(1L)._3 == h("write to <EMAIL> or <EMAIL> soon call <PHONE> ok"))
    assert(out(2L) == ((0L, 0L, h("no pii here at all"))),
      "clean doc must pass through byte-identical")
    assert(out(3L)._1 == 1L && out(3L)._2 == 1L, s"doc 3 counts: ${out(3L)}")
    assert(out(3L)._3 == h("<PHONE> overseas and <EMAIL>"))
  }

  test("span dedup excises planted cross-doc spans exactly once corpus-wide") {
    def ws(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    val span = ws("s", 1, 50)    // the 50-token boilerplate block
    val span2 = ws("r", 1, 12)   // a within-doc repeat
    val short = ws("t", 1, 7)    // 7 tokens — below the SpanK=8 floor
    val docs = Seq(
      (1L, ws("a", 1, 10) + " " + span + " " + ws("b", 1, 10)),   // first occurrence
      (2L, ws("c", 1, 10) + " " + span + " " + ws("d", 1, 10)),   // cross-doc repeat
      (3L, ws("z", 1, 20)),                                       // untouched
      (4L, ws("e", 1, 5) + " " + span + " " + ws("f", 1, 5)),     // third occurrence
      (5L, span2 + " " + ws("g", 1, 10) + " " + span2),           // intra-doc repeat
      (6L, ws("h", 1, 10) + " " + short + " " + ws("i", 1, 10)),  // sub-threshold…
      (7L, ws("j", 1, 10) + " " + short + " " + ws("k", 1, 10))   // …pair survives
    ).toDF("doc_id", "text")
    val out = graft.queries.Cleaning.spanDedup(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    // first occurrence keeps everything; every later occurrence is
    // excised exactly — surrounding text intact
    assert(out(1L) == ((70L, 0L, ws("a", 1, 10) + " " + span + " " + ws("b", 1, 10))),
      s"canonical doc was modified: ${out(1L)}")
    assert(out(2L) == ((70L, 50L, ws("c", 1, 10) + " " + ws("d", 1, 10))),
      s"cross-doc repeat not excised cleanly: ${out(2L)}")
    assert(out(4L) == ((60L, 50L, ws("e", 1, 5) + " " + ws("f", 1, 5))),
      s"third occurrence not excised: ${out(4L)}")
    // within one doc the FIRST copy survives, the second goes
    assert(out(5L) == ((34L, 12L, span2 + " " + ws("g", 1, 10))),
      s"intra-doc repeat wrong: ${out(5L)}")
    // repeats shorter than SpanK are content, not boilerplate
    assert(out(6L)._2 == 0L && out(7L)._2 == 0L,
      s"sub-threshold span was excised: ${out(6L)} ${out(7L)}")
    assert(out(3L) == ((20L, 0L, ws("z", 1, 20))))
  }

  test("span dedup treats NULL and empty text as zero-token docs, never null-propagates") {
    val docs = Seq((1L, "real content here"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val out = graft.queries.Cleaning.spanDedup(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(2L) == ((0L, 0L, "")), s"NULL text must read empty: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, "")), s"empty text wrong: ${out(3L)}")
    assert(out(1L)._1 == 3L)
  }

  test("randomized differential: span + paragraph dedup match in-memory references on phrase-built corpora") {
    // docs are concatenations of phrases drawn from a small pool, so
    // cross-doc repeated spans (>= 8 tokens) and repeated paragraphs
    // arise naturally at random offsets — the planted cases above
    // pin specific shapes, this pins the full semantics on inputs
    // nobody hand-picked
    val SpanK = 8      // Cleaning.SpanK
    val ParaTokens = 3 // Cleaning.ParaTokens
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val pool = Vector.tabulate(8)(p =>
        Vector.fill(4 + rnd.nextInt(7))(s"w${rnd.nextInt(12)}"))
      val docs = (0L until 30L).map { id =>
        val toks = Vector.fill(1 + rnd.nextInt(4))(pool(rnd.nextInt(pool.size)))
          .flatten
        (id, toks.mkString(" "))
      }
      val byId = docs.toMap.map { case (k, v) =>
        k -> v.split(" ").filter(_.nonEmpty).toVector }

      // ---- span dedup reference: first occurrence per 8-shingle ----
      val occ = byId.toSeq.flatMap { case (id, t) =>
        (0 to t.length - SpanK).map(i => (t.slice(i, i + SpanK).mkString(" "), id, i))
      }
      val first = occ.groupBy(_._1).map { case (k, os) =>
        k -> os.map(o => (o._2, o._3)).min }
      val drops = occ.filter { case (k, id, p) => first(k) != ((id, p)) }
        .groupBy(_._2).map { case (id, os) =>
          id -> os.flatMap(o => o._3 until o._3 + SpanK).toSet }
      val wantSpan = byId.map { case (id, t) =>
        val d = drops.getOrElse(id, Set.empty[Int])
        id -> ((t.length.toLong, d.size.toLong,
          t.zipWithIndex.collect { case (w, i) if !d(i) => w }.mkString(" ")))
      }
      val gotSpan = graft.queries.Cleaning.spanDedup(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(gotSpan == wantSpan, s"trial $trial: span dedup diverges")

      // ---- paragraph dedup reference: first occurrence per chunk ----
      val paras = byId.toSeq.flatMap { case (id, t) =>
        t.grouped(ParaTokens).zipWithIndex.map { case (c, i) =>
          (c.mkString(" "), id, i) }
      }
      val pFirst = paras.groupBy(_._1).map { case (k, os) =>
        k -> os.map(o => (o._2, o._3)).min }
      val wantPara = byId.map { case (id, t) =>
        val kept = paras.filter { case (k, i2, p) =>
          i2 == id && pFirst(k) == ((id, p)) }.sortBy(_._3)
        id -> ((math.ceil(t.length / ParaTokens.toDouble).toLong,
          kept.length.toLong, kept.map(_._1).mkString(" ")))
      }
      val gotPara = graft.queries.Cleaning.paragraphDedup(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(gotPara == wantPara, s"trial $trial: paragraph dedup diverges")
      spark.catalog.clearCache() // dedup persist contract
    }
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

  test("q134 gate: per-rule counts on a planted corpus, pass_all is the conjunction") {
    // five planted docs (rule overlaps counted independently — the
    // ablation reading):
    //  d1: 5 'value' tokens   -> fails min_tokens AND mean_token_len
    //                            (mean 5.0 > 4.8); 5 stop hits so
    //                            stopword_min passes
    //  d2: 95 'value' tokens  -> fails max_tokens + mean_token_len
    //  d3: 40 'a' tokens      -> mean 1.0 < 4.2 fails mean_token_len
    //                            ('a' IS a stopword: 40 hits, passes)
    //  d4: 40 'xxxx' tokens   -> mean 4.0 < 4.2 fails len; 0
    //                            stopwords fails stopword_min
    //  d5: 20 'value'+20 'fast' -> 40 toks, mean 4.5, 40 stop hits
    //                            -> passes everything
    def rep(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")
    val docs = Seq(
      rep("value", 5),
      rep("value", 95),
      rep("a", 40),
      rep("xxxx", 40),
      rep("value", 20) + " " + rep("fast", 20)
    ).toDF("text")
    val out = graft.queries.Quality.heuristicGate(docs)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("1_min_tokens", 1L, 5L),        // d1
      ("2_max_tokens", 1L, 95L),       // d2
      ("3_mean_token_len", 4L, 180L),  // d1 + d2 + d3 + d4
      ("4_stopword_min", 1L, 40L),     // d4
      ("5_pass_all", 1L, 40L)))        // d5
  }

  test("q93 plan: excision is a narrow array rebuild, not a token-level regroup") {
    // the round-8 rewrite replaced the corpus-token anti-join +
    // collect_list regroup with a per-doc drop-set join and an
    // index-filtered array rebuild; collect_list reappearing in the
    // plan means the token-level regroup crept back
    val plan = SparkEntry.queries("q93_span_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      s"q93 regroups corpus tokens via collect_list:\n$plan")
    assert(plan.contains("collect_set"),
      "q93 lost its per-doc drop-set aggregate")
  }

  test("q171 k-anonymity: planted cells report exact k/l and the release verdicts") {
    val rows = Seq(
      // cell (1, A, 0): k=5, l=3 → publishable
      (1L, "A", 0L, 10.0), (1L, "A", 0L, 10.0), (1L, "A", 0L, 20.0),
      (1L, "A", 0L, 30.0), (1L, "A", 0L, 30.0),
      // cell (1, B, 0): k=5 but l=2 → k-anonymous yet NOT l-diverse
      (1L, "B", 0L, 1.0), (1L, "B", 0L, 1.0), (1L, "B", 0L, 1.0),
      (1L, "B", 0L, 2.0), (1L, "B", 0L, 2.0),
      // cell (2, A, -1): singleton (negative band) → suppress
      (2L, "A", -1L, 5.0)
    ).toDF("nationkey", "segment", "band", "sensitive")
    val out = graft.queries.Cleaning.kAnonymity(rows)
      .as[(Long, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      (1L, "A", 0L, 5L, 3L, 1L, 1L, 0L),
      (1L, "B", 0L, 5L, 2L, 1L, 0L, 1L),
      (2L, "A", -1L, 1L, 1L, 0L, 0L, 1L)), s"q171 diverges: $out")
  }

  test("q178 secret scan: credential shape flagged, long clean word / short hex / low-diversity miss") {
    val docs = Seq(
      // one credential among prose → flagged, masked example
      (1L, "deploy with sk4f3a9b1c27de56a0f18e then restart"),
      // 25 letters, no digit → not a secret
      (2L, "internationalizationwords everywhere"),
      // short hex (12 chars) → under the length floor
      (3L, "hash a1b2c3d4e5f6 ok"),
      // 20 chars but 2 distinct characters → under the diversity floor
      (4L, "pad a1a1a1a1a1a1a1a1a1a1 done")
    ).toDF("doc_id", "text")
    val out = graft.queries.Cleaning.secretScan(docs)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 5L, 1L, 22L, "sk4f3a***")), s"q178 diverges: $out")
  }

  test("randomized differential: q171 matches an in-memory reference on random record sets") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 3) {
      val rows = (0 until 200).map { _ =>
        (rnd.nextInt(4).toLong, s"S${rnd.nextInt(3)}",
          rnd.nextInt(3).toLong - 1L, (rnd.nextInt(6) * 7).toDouble)
      }
      val want = rows.groupBy(r => (r._1, r._2, r._3)).toSeq
        .map { case ((n, s, b), g) =>
          val k = g.size.toLong
          val l = g.map(_._4).distinct.size.toLong
          val ka = if (k >= 5) 1L else 0L
          val ld = if (l >= 3) 1L else 0L
          (n, s, b, k, l, ka, ld, if (ka == 1 && ld == 1) 0L else 1L)
        }.sortBy(r => (r._1, r._2, r._3))
      val got = graft.queries.Cleaning.kAnonymity(
        rows.toDF("nationkey", "segment", "band", "sensitive"))
        .as[(Long, String, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
      assert(got == want, s"trial $trial: q171 diverges")
    }
  }
}
