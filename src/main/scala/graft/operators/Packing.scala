package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

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

  /** EMIT the packed sequences [[packSequences]] only positions — the
    * final materialization step that turns per-doc token-id arrays into
    * the fixed-`budget` training sequences a shard file stores. Output:
    * one row per (shard, seq_idx) with
    *  - `seq_tokens`   — the sequence's token ids, exactly `budget`
    *                     long except each shard's tail sequence
    *  - `doc_ids`      — the docs contributing, in stream order
    *  - `doc_offsets`  — where each doc's PIECE starts inside the
    *                     sequence (a straddler continues in the next
    *                     sequence at offset 0) — the boundary table a
    *                     loader needs to mask cross-doc attention
    *  - `n_tokens`     — size(seq_tokens)
    * Stream order is [[packSequences]]'s exact (hash, id) order, so the
    * positions q152 reports and the sequences emitted here agree
    * row-for-row (PackingSpec asserts the concat identity:
    * per shard, concat(sequences) == concat(docs in stream order)).
    *
    * Scale shape: ONE exchange. The running-sum window hash-partitions
    * on `shard`; the per-doc explode into spanned-sequence PIECES is
    * narrow (each doc yields n_spanned slices — no data amplification,
    * the slices partition the doc); and the (shard, seq_idx) assembly
    * aggregation reuses the window's shard partitioning (shard ⊆ the
    * grouping key satisfies the clustered distribution, so Catalyst
    * plans NO second shuffle — spec-pinned). Per-group state is
    * budget-bounded (≤ budget tokens per sequence), so no task ever
    * holds more than one sequence's tokens per group: safe at any
    * corpus size, exactly the property a single global collect_list
    * would lack. Zero-token docs emit nothing (they hold no tokens;
    * their POSITION still reports via packSequences). */
  def emitPackedSequences(df: DataFrame, idCol: String, tokCol: String,
                          budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    require(df.schema(df.schema.fieldIndex(tokCol)).dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType],
      s"$tokCol must be an ARRAY column")
    val w = Window.partitionBy("shard")
      .orderBy(col("__pk_hv"), col("__pk_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df
      .select(col(idCol).cast(LongType).as("__pk_id"),
        col(tokCol).as("__pk_toks"))
      .withColumn("__pk_n", size(col("__pk_toks")).cast(LongType))
      .withColumn("__pk_hv",
        TextOps.hash64(concat(lit("pack#"),
          col("__pk_id").cast(StringType))))
      .withColumn("shard", pmod(col("__pk_hv"), lit(shards.toLong)))
      .withColumn("__pk_start",
        coalesce(sum(col("__pk_n")).over(w), lit(0L)))
      // a zero-token doc contributes 0 to every later running sum, so
      // dropping it here changes no other doc's position
      .where(col("__pk_n") > 0)
      .withColumn("__pk_seq", explode(expr(
        s"sequence(__pk_start div ${budget}L, " +
          s"(__pk_start + __pk_n - 1) div ${budget}L)")))
      .withColumn("__pk_from",
        greatest(lit(0L), col("__pk_seq") * budget - col("__pk_start")))
      .withColumn("__pk_until",
        least(col("__pk_n"),
          (col("__pk_seq") + 1) * budget - col("__pk_start")))
      .withColumn("__pk_piece", expr(
        "slice(__pk_toks, CAST(__pk_from + 1 AS INT), " +
          "CAST(__pk_until - __pk_from AS INT))"))
      .withColumn("__pk_off",
        col("__pk_start") + col("__pk_from") - col("__pk_seq") * budget)
      .groupBy(col("shard"), col("__pk_seq"))
      .agg(sort_array(collect_list(struct(
        col("__pk_hv").as("hv"), col("__pk_id").as("id"),
        col("__pk_off").as("off"), col("__pk_piece").as("piece"))))
        .as("__pk_parts"))
      .select(col("shard"), col("__pk_seq").as("seq_idx"),
        expr("flatten(transform(__pk_parts, p -> p.piece))")
          .as("seq_tokens"),
        expr("transform(__pk_parts, p -> p.id)").as("doc_ids"),
        expr("transform(__pk_parts, p -> p.off)").as("doc_offsets"))
      .withColumn("n_tokens", size(col("seq_tokens")).cast(LongType))
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
    * corpus), and NOT physical-partition arithmetic (`spark_partition_id`
    * over a fresh exchange is NOT stable across consumers: AQE may
    * coalesce one read of the shuffle and not another, so a two-pass
    * partition-offset join can silently drop or misnumber rows — caught
    * live by the scale rehearsal, 5000 docs -> 157). Everything here is
    * derived from the DATA instead: the first `bucketHexChars` hex chars
    * of the key split the order into 16^c contiguous key-range buckets
    * (md5 is uniform, so buckets balance at ~n/16^c rows), `row_number`
    * ranks within each bucket as an ordinary keyed window, and each
    * bucket's global offset is a running sum over the 16^c-row
    * bucket-count aggregate (tiny, single-task by design). rank = bucket
    * offset + within-bucket position: fully deterministic for any
    * physical partitioning, any AQE decision, any engine re-run.
    *
    * Bucket ordering is consistent with key-string ordering because hex
    * digits sort identically by ASCII and by value ('0'-'9' < 'a'-'f'),
    * so (bucket asc, key asc within bucket) == ORDER BY key asc
    * globally. `bucketHexChars` sizes the split: each bucket must fit a
    * task's sort while the offset table stays broadcast-sized — the
    * default 4096 buckets hold to ~10^10 rows; a 100 TB corpus passes
    * 4-5. Ranks do NOT depend on the choice. The offsets join carries an
    * explicit broadcast hint only up to 16^5 ≈ 1M potential offset rows
    * (~16 MB); above that (c = 6-8, up to 4.3B rows) the hint is dropped
    * and AQE decides from the MEASURED size — forcing the hint there
    * could OOM the driver on exactly the corpora that need wide splits
    * (the topFractionPerKey unhinted-join rationale). */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
                           shards: Int, bucketHexChars: Int = 3): DataFrame = {
    require(shards > 0)
    require(bucketHexChars >= 1 && bucketHexChars <= 8,
      s"bucketHexChars must be in [1, 8], got $bucketHexChars")
    val keyed = df
      .withColumn("__shuf_key",
        md5(concat_ws(":", lit(seed), col(idCol).cast(StringType))))
      .withColumn("__shuf_bucket",
        conv(substring(col("__shuf_key"), 1, bucketHexChars), 16, 10)
          .cast("long"))
    val withinW = Window.partitionBy("__shuf_bucket")
      .orderBy(col("__shuf_key"), col(idCol))
    val offsets = keyed.groupBy("__shuf_bucket").agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(
        sum(col("__cnt")).over(Window.orderBy("__shuf_bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__shuf_bucket", "__offset")
    // the require bounds only the EXPONENT; the hint must respect the
    // implied row count — min(n, 16^c) can reach 4.3B at c=8
    val offsetsSide =
      if (bucketHexChars <= 5) broadcast(offsets) else offsets
    keyed.withColumn("__within", row_number().over(withinW).cast(LongType))
      .join(offsetsSide, Seq("__shuf_bucket"))
      .withColumn("shuffle_rank", col("__offset") + col("__within") - 1L)
      .withColumn("shard_id", pmod(col("shuffle_rank"), lit(shards.toLong)))
      .drop("__shuf_key", "__shuf_bucket", "__within", "__offset")
  }
}
