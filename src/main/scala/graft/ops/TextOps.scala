package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.expressions.TextPolyHash

/** Text operators (reference surface: token counting `script512.py:21`,
  * sentence split `run_extra.py:61`, chunking `run_extra.py:64-71`,
  * prompt pairs `run.py:139`; extensions: language-ID, quality score,
  * fingerprint — SURVEY.md §2.6, builder brief "text analysis").
  *
  * Everything here is a Column builder over Spark built-ins
  * (codegen'd, no UDF in the hot path). Each op documents its exact
  * DuckDB-SQL twin used by the oracle (builders in
  * graft.queries.TextVector.Sql; numeric conventions in
  * graft.ops.Determinism.Oracles).
  */
object TextOps {

  /** BPE-ish tokenizer: maximal alphanumeric runs OR single
    * non-space symbol. Deterministic stand-in for the reference's HF
    * AutoTokenizer (`script512.py:5` — a model artifact, not a query
    * capability). Same regex runs in DuckDB (RE2) and Spark (Java
    * regex); the whitespace class is spelled out explicitly because
    * `\s` IS dialect-divergent — Java includes \x0B (vertical tab),
    * RE2 does not. TokenHashesKernel's scanner implements the same
    * set.
    */
  val WsClass = " \\t\\n\\x0B\\f\\r"
  val TokenPattern = s"([A-Za-z0-9]+|[^A-Za-z0-9$WsClass])"

  /** tokens(text): ArrayType(StringType).
    * DuckDB: regexp_extract_all(text, pattern, 1). */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit(TokenPattern), lit(1))

  /** GPT-2-style BPE pre-tokenization (the public convention from
    * Radford et al. 2019's released tokenizer regex): contraction
    * suffixes split off as their own pre-tokens ('s 't 're 've 'm
    * 'll 'd — alternation order matters, they outrank the
    * punctuation-run class at the apostrophe), then letter runs,
    * digit runs, and non-space symbol runs. BPE merges never cross a
    * pre-token boundary, which is what makes trained tables
    * interchangeable with public GPT-2-family tokenizers. Two
    * deliberate deviations from the verbatim GPT-2 pattern, both for
    * cross-engine determinism: ASCII classes instead of \p{L}/\p{N}
    * (engines ship different Unicode tables; same rationale as
    * [[TokenPattern]]), and no ` ?` leading-space capture / `\s+(?!\S)`
    * trailing-space alternative (RE2 has no lookahead, and the
    * space-marker convention is a display encoding, not a merge
    * semantic — whitespace here simply separates pre-tokens).
    * DuckDB twin: regexp_extract_all(text, pattern, 0) with
    * doubled-apostrophe SQL escaping (graft.queries.TextVector.Sql.preToks). */
  val PreTokenPattern =
    s"'s|'t|'re|'ve|'m|'ll|'d|[A-Za-z]+|[0-9]+|[^A-Za-z0-9$WsClass]+"

  /** preTokens(text): ArrayType(StringType) — the BPE trainer/encoder
    * word source ([[graft.pipeline.BpeTrainer]]). */
  def preTokens(text: Column): Column =
    regexp_extract_all(text, lit(PreTokenPattern), lit(0))

  /** Token count (T1). DuckDB: len(regexp_extract_all(..)). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Sentence split (T2): segments terminated by [.!?]+ or EOS.
    * DuckDB: string_split_regex + list_filter on non-empty trim.
    * Explicit whitespace class for the same \s-divergence reason as
    * TokenPattern. */
  val SentencePattern = s"[.!?]+[$WsClass]*"
  def sentences(text: Column): Column =
    filter(split(text, SentencePattern), s => length(trim(s)) > 0)

  /** Chunk tokens into fixed windows of `n` tokens, re-joined with a
    * single space (T3+T4 analog of `run_extra.py:64-74`; the
    * reference slices to max_tokens=512 — window size is a
    * parameter). slice() is 1-based, like DuckDB list slicing.
    * DuckDB: list_transform(range(0, ceil(len/n)), i ->
    *           array_to_string(toks[i*n+1 : i*n+n], ' '))
    *
    * PERF: `toks` must be a materialized column attribute, not an
    * inline `tokens(text)` call — HOF lambdas are interpreted with no
    * cross-iteration CSE, so an inlined regex re-tokenizes the whole
    * text once per window (O(windows × |text|) per row). `toks` is
    * referenced 3× here, which blocks CollapseProject from inlining
    * an upstream `.withColumn("toks", tokens(text))`. */
  def chunksOf(toks: Column, n: Int): Column = {
    // NB: Spark sequence(a,b) DESCENDS when a>b (DuckDB range() is
    // empty) — guard the zero-token case explicitly.
    when(size(toks) === 0, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0L), ceil(size(toks).cast("double") / lit(n)).cast("long") - 1),
        i => array_join(slice(toks, (i * n + 1).cast("int"), lit(n)), " ")))
  }

  /** Convenience form; prefer `chunksOf` over a tokens column in
    * anything hot (see PERF note there). */
  def chunks(text: Column, n: Int): Column = chunksOf(tokens(text), n)

  /** Prompt-pair construction (T5, `run.py:139`): the instruction
    * prefix the embedding model consumes. */
  def promptPair(prompt: String, content: Column): Column =
    array(lit(prompt), content)

  /** Rolling-hash document fingerprint — custom Catalyst expression
    * (whole-stage codegen; see TextPolyHash). ~2³⁰-range: fine for
    * sampling / bucket keys (q84's rate gate, q41's demo funnel), NOT
    * for an exact-dup verdict at corpus scale — that is
    * [[fingerprintHi]]/[[fingerprintLo]] (128-bit, q23 + DedupIndex). */
  def fingerprint(text: Column): Column = TextPolyHash(text)

  // The 128-bit exact-dup fingerprint: four independent polynomial
  // hashes (disjoint base/mod families, each mod < 2³¹ so every fold
  // step stays in int64 under ANSI mode) packed into two BIGINTs.
  // fingerprintHi's high word is the CLASSIC fingerprint (base 31,
  // mod 1e9+7) — fp_hi div FpHiMod2 recovers the old key, so an index
  // migration can verify old-vs-new agreement in place. Combined
  // keyspace ≈ 2¹²³: first expected birthday collision past 10¹⁸
  // docs, vs ~10^4.5 for the single 30-bit hash (whose false "exact"
  // verdict silently drops a document). Exactly re-playable in DuckDB
  // BIGINT (TextVector.Sql.polyHashPacked) so q23 stays hash-gated.
  final val FpHiMod2 = 2147483629L // prime < 2^31
  final val FpLoMod1 = 2147483647L // 2^31 - 1 (Mersenne prime)
  final val FpLoMod2 = 2147483587L // prime < 2^31

  /** High 64 bits of the 128-bit exact-dup fingerprint. */
  def fingerprintHi(text: Column): Column =
    graft.ops.expressions.TextPolyHashPacked(
      text, 31L, graft.ops.expressions.HashKernel.Mod, 131L, FpHiMod2)

  /** Low 64 bits of the 128-bit exact-dup fingerprint. */
  def fingerprintLo(text: Column): Column =
    graft.ops.expressions.TextPolyHashPacked(
      text, 257L, FpLoMod1, 65599L, FpLoMod2)

  // --- language ID (n-gram/stopword heuristic) -------------------
  // Tiny per-language marker dictionaries. Prediction quality is a
  // heuristic; what matters for the gate is that the DuckDB oracle
  // computes the identical argmax (fixed tie order en>de>fr>es,
  // fallback 'und').
  val LangDicts: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "value", "fast"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "los", "las", "es", "un", "una", "y")
  )

  private def langScore(toks: Column, dict: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(dict.map(lit): _*), t)))

  /** Predicted language code from a materialized tokens column
    * (same PERF contract as chunksOf). DuckDB twin built in
    * TextVector.oracles("q26_text_stats"). */
  def langIdOf(toks: Column): Column = {
    val scores = LangDicts.map { case (l, d) => (l, langScore(toks, d)) }
    // argmax with fixed priority order; all-zero -> 'und'
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Convenience form; prefer `langIdOf` in anything hot. */
  def langId(text: Column): Column = langIdOf(tokens(text))

  /** Quality score in [0,1]: fixed-order double arithmetic so the
    * oracle reproduces it bit-exactly.
    *   0.4 * min(n_tokens/100, 1)            (length signal)
    * + 0.3 * (distinct_tokens / n_tokens)    (lexical diversity)
    * + 0.3 * (stopword_hits / n_tokens)      (naturalness)
    */
  def qualityScoreOf(toks: Column): Column = {
    val n = size(toks).cast("double")
    val stop = langScore(toks, LangDicts.head._2).cast("double")
    val dist = size(array_distinct(toks)).cast("double")
    lit(0.4) * least(n / lit(100.0), lit(1.0)) +
      lit(0.3) * (dist / n) +
      lit(0.3) * (stop / n)
  }

  /** Convenience form; prefer `qualityScoreOf` in anything hot. */
  def qualityScore(text: Column): Column = qualityScoreOf(tokens(text))

  /** Word k-shingles as strings (dedup building block).
    * DuckDB: list_transform(range(1, len-k+2), i ->
    *   array_to_string(toks[i:i+k-1], ' '))
    * Same PERF contract as `chunksOf`: pass a materialized tokens
    * column, not an inline regex. */
  def shinglesOf(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i.cast("int"), lit(k)), " ")))

  /** Convenience form; prefer `shinglesOf` in anything hot. */
  def shingles(text: Column, k: Int): Column = shinglesOf(tokens(text), k)
}
