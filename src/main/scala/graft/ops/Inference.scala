package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}

/** Per-partition batched inference — the Spark shape of the
  * reference's model loop (`run.py:128-144`: DataLoader batches of
  * 32 → `model.encode(batch)`): one encoder instance per partition
  * (≙ model handle per executor core), rows grouped into fixed-size
  * batches, the tail batch flushed (the reference's L2 tail-drop,
  * `run.py:138-148`, is structurally impossible — `grouped` always
  * emits the remainder).
  *
  * Implementations must be Serializable (shipped to executors) and
  * deterministic per input (the engine's oracle/test contract). A
  * real model (the reference's InstructorXL, `run.py:9-10`) plugs in
  * by holding its handle lazily in the encoder instance.
  */
trait BatchEncoder[I, O] extends Serializable {
  def encodeBatch(xs: Seq[I]): Seq[O]
}

object Inference {
  /** mapPartitions ∘ grouped(batchSize) ∘ encodeBatch. Narrow — no
    * shuffle; parallelism = input partitions. */
  def mapBatched[I, O: Encoder](ds: Dataset[I], batchSize: Int,
                                enc: BatchEncoder[I, O]): Dataset[O] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val out = enc.encodeBatch(batch)
        require(out.length == batch.length,
          s"encoder returned ${out.length} rows for a ${batch.length}-row batch")
        out
      }
    }
}
