package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.text.TextOps

/** Concat-and-chunk sequence packing — the standard LLM-pretraining layout:
  * documents are concatenated into one token stream and cut into
  * fixed-`budget` training sequences, so no sequence is padded and a
  * document may straddle a cut. This operator computes, for every document,
  * WHERE its tokens land: which sequence it starts in, at what offset, and
  * how many sequences it spans.
  *
  * Scale shape: a single global stream would be one unpartitioned running
  * sum — a global sort onto one task. Instead the corpus is split into
  * `shards` deterministic hash-buckets and each shard packs its own stream
  * independently (production: one shard per output file; thousands of
  * shards at 100 TB). Within a shard, order is the stable (hash, id) pair —
  * reproducible across runs/partitionings AND a cheap global shuffle of the
  * corpus, which packing wants anyway (dedup/curation leave neighboring
  * docs correlated). Cost: one shuffle on the shard key + per-shard sort —
  * the same shape as any keyed window.
  */
object Packing {

  /** Per-document packing positions. Output adds:
    *  - `shard`     — deterministic hash bucket in [0, shards)
    *  - `seq_idx`   — index (within the shard) of the sequence the doc
    *                  starts in
    *  - `seq_offset`— token offset of the doc inside that sequence
    *  - `n_spanned` — how many sequences the doc touches (>= 1; boundary
    *                  straddlers have 2+; a zero-token doc counts as
    *                  touching the sequence its position falls in)
    * `nTokCol` is a non-negative token (or char/byte) count. */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
                    budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val h = TextOps.hash64(concat(lit("pack#"), col(idCol).cast(StringType)))
    val w = Window.partitionBy("shard").orderBy(col("pack_hv"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // `__pack_n` pins the token count to a fixed internal name so the SQL
    // `div` expressions never interpolate a caller-supplied column name
    df.withColumn("__pack_n", col(nTokCol))
      .withColumn("pack_hv", h)
      .withColumn("shard", pmod(col("pack_hv"), lit(shards.toLong)))
      .withColumn("pack_start",
        coalesce(sum(col("__pack_n")).over(w), lit(0L)))
      .withColumn("seq_idx", expr(s"pack_start div ${budget}L"))
      .withColumn("seq_offset", pmod(col("pack_start"), lit(budget)))
      // greatest(1): an empty doc's [start, start) interval has no last
      // token — clamp so the >=1 span contract holds
      .withColumn("n_spanned", greatest(lit(1L),
        expr(s"(pack_start + __pack_n - 1) div ${budget}L")
          - col("seq_idx") + 1))
      .drop("pack_hv", "pack_start", "__pack_n")
  }

  /** Deterministic global shuffle: a reproducible random TOTAL ORDER over
    * the corpus — `shuffle_rank` (dense, 0-based) and `shard_id`
    * (`rank % shards`, the round-robin training-shard assignment that
    * gives every shard an unbiased sample of the corpus). Training-data
    * layout wants exactly this: dedup/curation leave neighboring docs
    * correlated (same crawl, same source), and a data-parallel trainer
    * reading shard files in rank order must see an order that is (a)
    * uniform-random, (b) identical across reruns, (c) re-derivable from
    * (seed, id) alone. The sort key is the md5 of `seed:id` — engine-
    * portable hex, so an external system can re-derive any doc's position.
    *
    * SCALE SHAPE: NOT a global `row_number` window (one task sorts the
    * corpus). A range exchange on the key orders the PARTITIONS, each
    * partition sorts locally, and the dense rank is partition offset +
    * local position — [[graft.ops.ColumnOps.factSurrogateKey]]'s two-pass
    * offset pattern, whose per-partition counts ride a tiny (#partitions-
    * row) aggregate. Rank depends only on the total (key, id) order, which
    * is unique per id — range boundary sampling cannot change the result,
    * only the partition sizes. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
                           shards: Int): DataFrame = {
    require(shards > 0)
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast(StringType)))
    val sorted = df.withColumn("__shuf_key", key)
      .repartitionByRange(col("__shuf_key"), col(idCol))
      .sortWithinPartitions(col("__shuf_key"), col(idCol))
    graft.ops.ColumnOps.factSurrogateKey(sorted, "shuffle_rank")
      .withColumn("shard_id", pmod(col("shuffle_rank"), lit(shards.toLong)))
      .drop("__shuf_key")
  }
}
