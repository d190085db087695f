package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Iterative BPE tokenizer induction — the training LOOP whose first
  * round q87 exposes as a query (count adjacent symbol pairs, merge
  * the winner, re-count, repeat). The engine's runtime tokenizer is a
  * fixed stand-in (SURVEY T1); this job is how a team would TRAIN the
  * real vocabulary from their own corpus.
  *
  * Distributed shape (the part that matters at 100 TB): one
  * aggregation collapses the corpus to its weighted vocabulary
  * (word, freq) — the only pass that touches the text, after which
  * everything is bounded by |vocab|, orders smaller than the corpus.
  * Each merge round then runs ON THE CLUSTER over the vocab table:
  * a pair explode + freq-weighted groupBy (pair space bounded by
  * symbol-alphabet², tiny shuffle), a 1-row collect of the argmax
  * (count desc, then pair lexicographic — fully deterministic), and
  * one narrow kernel pass applying the merge
  * ([[graft.ops.expressions.BpeMerge]]). The driver orchestrates
  * rounds exactly like [[graft.ops.ConnectedComponents.run]]:
  * per-round localCheckpoint truncates lineage, superseded blocks
  * release immediately, and only (merge-pair, count) scalars ever
  * reach the driver.
  *
  * Conventions: the word source is the GPT-2 regex PRE-TOKENIZER
  * ([[graft.ops.TextOps.PreTokenPattern]] — contraction suffixes
  * split off before letter/digit/symbol runs, so "don't" seeds as
  * the two pre-tokens "don" and "'t" and no merge can ever bridge
  * the apostrophe — the public-interop requirement;
  * `preTokenize = false` recovers the engine's plain tokens()
  * splitting). Symbols start as the pre-token's characters plus a
  * trailing end-of-word marker `</w>` (the GPT-2/Sennrich
  * convention — vocabularies distinguish the word-final piece
  * "low</w>" from the prefix piece "low" in "lowest", so trained
  * merge tables are interchangeable with public tokenizers; the
  * marker cannot collide with corpus text because both splitters
  * emit either alnum-only runs or symbol-only runs, never the 4-char
  * mixed string). `markEow = false` recovers the bare-character
  * seeding (q87's pair-stats convention). Merges never cross word
  * boundaries — the pre-tokenizer already split words. Training
  * stops early when the best pair's weighted count drops below
  * `minFreq`.
  */
object BpeTrainer {

  /** GPT-2/Sennrich end-of-word marker, appended as its own seed
    * symbol to every word. */
  val EowMarker = "</w>"

  /** One merge decision: fuse adjacent (a, b) into a+b; `n` is the
    * freq-weighted pair count that won the round. */
  final case class Merge(a: String, b: String, n: Long)

  private def seedSymbols(word: org.apache.spark.sql.Column,
                          markEow: Boolean): org.apache.spark.sql.Column =
    if (markEow) concat(split(word, ""), array(lit(EowMarker)))
    else split(word, "")

  private def words(contentCol: String, preTokenize: Boolean) =
    if (preTokenize) TextOps.preTokens(col(contentCol))
    else TextOps.tokens(col(contentCol))

  /** Train up to `nMerges` BPE merges over `docs(contentCol)`.
    * Returns the ordered merge list (the tokenizer's merge table). */
  def train(spark: SparkSession, docs: DataFrame, contentCol: String,
            nMerges: Int, minFreq: Long = 2L,
            markEow: Boolean = true, preTokenize: Boolean = true): Seq[Merge] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    // THE corpus-scale pass: collapse to the weighted vocabulary.
    // split(word, '') seeds character-level symbols (+ the marker).
    var vocab = docs
      .select(explode(words(contentCol, preTokenize)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), seedSymbols(col("word"), markEow).as("symbols"))
      .localCheckpoint()
    var backing = vocab

    val merges = Seq.newBuilder[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // adjacent pairs, freq-weighted; both slices have size-1
      // elements so zip_with never pads
      val top = vocab
        .filter(size(col("symbols")) > 1)
        .select(col("freq"), explode(zip_with(
          slice(col("symbols"), lit(1), size(col("symbols")) - 1),
          slice(col("symbols"), lit(2), size(col("symbols")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(a, b, n)
        val next = vocab
          .select(col("freq"),
            graft.ops.expressions.BpeMerge(col("symbols"), a, b).as("symbols"))
          .localCheckpoint()
        graft.ops.ConnectedComponents.releaseCheckpoint(backing)
        backing = next
        vocab = next
        round += 1
      }
    }
    graft.ops.ConnectedComponents.releaseCheckpoint(backing)
    merges.result()
  }

  /** ENCODE with a trained merge table: every word of
    * `docs(contentCol)` splits to characters (+ the end-of-word
    * marker when `markEow`, matching how the table was trained) and
    * replays the merges in training order (one
    * [[graft.ops.expressions.BpeApply]] kernel pass per row —
    * merges-in-order reproduces the training-state tokenization).
    * Output: the input rows plus `bpe_tokens: array<string>`, the
    * document's sub-word pieces in text order; word-final pieces
    * carry the `</w>` suffix (strip it to reassemble the raw text).
    * Narrow map over the scan — no shuffle at any corpus size. */
  def encode(docs: DataFrame, contentCol: String, merges: Seq[Merge],
             markEow: Boolean = true, preTokenize: Boolean = true): DataFrame =
    docs.withColumn("bpe_tokens",
      encodePieces(words(contentCol, preTokenize), merges, markEow))

  /** [[encode]]'s column form: the BPE pieces of a pre-token ARRAY
    * column (callers that already materialized the word array — the
    * chunksOf PERF contract — avoid a second regex pass). */
  def encodePieces(ws: org.apache.spark.sql.Column, merges: Seq[Merge],
                   markEow: Boolean = true): org.apache.spark.sql.Column = {
    val table = merges.map(m => (m.a, m.b))
    flatten(transform(ws,
      w => graft.ops.expressions.BpeApply(seedSymbols(w, markEow), table)))
  }
}
