package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-probe training over an embedding column —
  * multinomial (softmax) logistic regression by full-batch gradient
  * descent, the "train a linear classifier head on frozen document
  * embeddings" stage every modern curation pipeline runs (the
  * FineWeb-Edu/QuRating pattern: an LLM or human labels a slice, a
  * linear probe on embeddings scores the whole corpus; the
  * reference embeds documents — `run.py:34` — and this is the
  * canonical consumer of those vectors). q98 exposes one training
  * run + corpus scoring as an oracle-gated query.
  *
  * Distributed shape (the 100-TB story): a GD round is ONE
  * map-side-combined aggregation — each partition folds its rows
  * into (class, feature) gradient cells, so at most K·(D+1) rows per
  * partition reach the shuffle and the driver collects exactly
  * K·(D+1) longs per round (650 here), never data. The weight
  * matrix rides INTO each round as a broadcast literal. Nothing in
  * the loop is O(corpus) driver state and lineage never grows (each
  * round reads the source afresh with a new literal — no
  * checkpointing needed, unlike the label-propagation loop). At
  * production scale the TRAIN input is a bounded labeled slice (the
  * labeled set is small by construction — labels are the expensive
  * part) while [[score]] runs over the full corpus as a narrow,
  * shuffle-free pass; both accept any (label, vector) frame.
  *
  * Cross-engine determinism (the oracle replays the FULL trajectory
  * — graft.ops.Determinism conventions): weights live as int64
  * MICRO-UNITS on the driver and enter each round as wm/1e6 doubles;
  * per-row logits fold in fixed index order (the
  * [[graft.ops.expressions.SoftmaxGradLoss]] kernel's ascending-j
  * loop ↔ DuckDB list_reduce over list_prepend); softmax
  * denominators fold the exp list in class order (never a windowed
  * SUM, whose addition order is engine-defined); per-term gradient
  * contributions quantize to int64 micro-units BEFORE the
  * order-independent integer sum; and the weight update
  * floor(lr·g/n + 0.5) is the same left-assoc double arithmetic in
  * both engines. exp/ln are StrictMath in the kernels — bit-identical
  * to Spark's own Exp/Log (fdlibm, platform-independent); DuckDB's
  * libm may still differ by 1 ulp — ~1e-16, absorbed by the 5e-7
  * micro-rounding slack (the q43/q72 argument; a flip would need a
  * term within ~1e-10 of a rounding boundary).
  */
object ProbeTrainer {

  /** Label classes in the testdata embeddings table (0..9). */
  val NumClasses = 10

  /** Training rounds / learning rate: full-batch GD from zero init
    * needs enough steps to move; 10 rounds at lr 16 reaches ~3.9x /
    * ~2.0x the 10% chance accuracy at sf0.01 / sf0.1 with the loss
    * still descending every round at all three scales (the synthetic
    * labels carry only weak linear signal — the gate is the exact
    * trajectory + above-chance floors in LearnSpec, not benchmark
    * accuracy). Each round is one cluster pass, so rounds trade
    * wall-clock directly; the lr=16/10-round point dominated
    * lr=8/16 on both accuracy and cost in the sweep. */
  val Rounds = 10
  val Lr = 16.0

  /** One training round's diagnostics: mean cross-entropy loss in
    * micro-units (exact int64 sum of per-row floor(-ln p_y · 1e6 +
    * 0.5)), BEFORE the round's update was applied. */
  final case class RoundStat(rn: Int, lossMicroSum: Long)

  /** `[1.0] ++ vec` as doubles — bias rides as feature 0. */
  private def biased(vecCol: String): Column =
    concat(array(lit(1.0)),
      transform(col(vecCol), v => v.cast("double")))

  private def asDoubles(wMicro: Array[Array[Long]]): Array[Array[Double]] =
    wMicro.map(_.map(_.toDouble / 1e6))

  /** Train `rounds` full-batch GD steps of a (k × dim+1) softmax
    * probe over `emb(labelCol, vecCol)`. Returns the trained weight
    * matrix in micro-units plus per-round loss diagnostics (free —
    * the loss rides the gradient vector's last cell). */
  def train(emb: DataFrame, labelCol: String = "label",
            vecCol: String = "embedding", k: Int = NumClasses,
            rounds: Int = Rounds, lr: Double = Lr)
      : (Array[Array[Long]], Seq[RoundStat]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val n = emb.count() // one count per training run (sizes the step)
    // fail loudly and early: an accidentally-empty labeled slice
    // (wrong predicate, empty ingest day) would otherwise surface as
    // an unrelated iterator error deep in the round loop — and n
    // divides the weight update (PageRank.run's empty-graph guard)
    require(n > 0, "probe training on an empty labeled set")
    // every training round re-reads this projection — one tiny cached frame
    // (labels + vectors), released before returning. Partitioning
    // tracks the LABELED SLICE (~1k rows/partition, capped at the
    // cluster's parallelism), not the corpus: a training round on a
    // 32-way split of 2k rows was pure task-launch overhead.
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, math.ceil(n / 1024.0).toInt))
    val base = emb.select(col(labelCol).cast("int").as("y"),
      biased(vecCol).as("xb")).repartition(parts).cache()
    try {
      val dims = base.select(size($"xb")).as[Int].head()
      val wm = Array.fill(k, dims)(0L)
      val stats = Seq.newBuilder[RoundStat]
      for (r <- 1 to rounds) {
        // one job per round: the fused kernel emits each example's
        // K·D micro gradient cells (+ loss) as one long array; the
        // flat-index explode + codegen hash aggregate folds them
        // with map-side combine, so every partition reduces to
        // <= K·D+1 rows before the shuffle and the driver collects
        // gradient CELLS, never data. (An Aggregator-over-Seq[Long]
        // UDAF measured ~1 s/round on 2k rows — per-row object
        // buffer conversion; the exploded primitive-long sum is
        // whole-stage codegen and ~10x cheaper.)
        val g = base
          .select(posexplode(graft.ops.expressions
            .SoftmaxGradLoss($"xb", $"y", asDoubles(wm))).as(Seq("i", "v")))
          .groupBy($"i").agg(sum($"v").as("s"))
          .as[(Int, Long)].collect().toMap
        stats += RoundStat(r, g(k * dims))
        for (kk <- 0 until k; j <- 0 until dims)
          // identical left-assoc double arithmetic to the SQL
          // replay: (lr * gm) / n, then floor(x + 0.5)
          wm(kk)(j) -=
            math.floor(lr * g(kk * dims + j).toDouble / n + 0.5).toLong
      }
      (wm, stats.result())
    } finally base.unpersist()
  }

  /** Score any (id, vector) frame with a trained probe: per-row
    * class prediction (argmax logit, first index on ties) and the
    * winning softmax probability, micro-rounded for cross-engine
    * display. Narrow, shuffle-free kernel pass — this is the stage
    * that runs over the FULL corpus at 100 TB, and the full corpus
    * is UNLABELED by construction (labels are the expensive part):
    * the `labelCol` column passes through only when the frame has
    * one (q98's labeled evaluation), otherwise the output simply
    * omits it. */
  /** Persist a trained head (k rows of (j, int64-micro weight list))
    * — the store [[graft.pipeline.CurationExport]]'s probe stage
    * loads; micro-units on disk keep the round-trip exact. */
  def save(spark: org.apache.spark.sql.SparkSession,
           wMicro: Array[Array[Long]], dir: String): Unit = {
    import spark.implicits._
    wMicro.zipWithIndex.map { case (row, j) => (j, row.toSeq) }.toSeq
      .toDF("j", "wm").coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a head persisted by [[save]] — exact inverse. */
  def load(spark: org.apache.spark.sql.SparkSession,
           dir: String): Array[Array[Long]] =
    spark.read.parquet(dir).select(col("j"), col("wm")).collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Long](1).toArray)

  def score(emb: DataFrame, wMicro: Array[Array[Long]],
            idCol: String = "vec_id", labelCol: String = "label",
            vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val labelCols =
      if (emb.columns.contains(labelCol))
        Seq(col(labelCol).cast("int").as("label"))
      else Seq.empty
    emb.select(col(idCol) +: labelCols :+ biased(vecCol).as("xb"): _*)
      .withColumn("s",
        graft.ops.expressions.SoftmaxScore($"xb", asDoubles(wMicro)))
      .select(col(idCol) +: labelCols.map(_ => $"label") :+
        $"s.pred".as("pred") :+
        graft.ops.Determinism.roundFix($"s.p", 6).as("score"): _*)
  }

  /** Per-class probabilities, micro-quantized and exploded to one
    * row per (id, class) — the confident-learning input (q174).
    * [[score]] keeps only the argmax; noise estimation compares
    * EVERY class's probability against that class's own confidence
    * threshold. Same narrow shuffle-free scan shape (K rows out per
    * document, K a constant). */
  def probs(emb: DataFrame, wMicro: Array[Array[Long]],
            idCol: String = "vec_id", labelCol: String = "label",
            vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(idCol), col(labelCol).cast("int").as("label"),
        biased(vecCol).as("xb"))
      .select(col(idCol), $"label", posexplode(
        graft.ops.expressions.SoftmaxProbs($"xb", asDoubles(wMicro)))
        .as(Seq("j", "p")))
      .select(col(idCol), $"label", $"j".cast("int").as("j"),
        floor($"p" * lit(1e6) + lit(0.5)).cast("long").as("pm"))
  }
}
