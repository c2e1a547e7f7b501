package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch decode/feature-extract scaffolding.
  *
  * The decode step itself is a STUB (no image/audio libraries exist in this
  * container): [[FakeDecoder.decode]] produces a deterministic fake
  * "feature" from the bytes. Everything around it — the schema, the
  * per-partition batch shape, the partitioning strategy, the expression-only
  * metadata path — is real and tested, so a real decoder drops in by
  * replacing one function.
  *
  * SCALE DESIGN: media blobs dominate bytes, so (1) metadata extraction is
  * pure column expressions evaluated at scan (never materializes the blob
  * downstream if pruned), (2) decoding runs inside `mapPartitions` so any
  * native decoder amortizes per-partition init (model load, codec context),
  * the Scala analogue of pandas-batch UDFs, and (3) outputs drop the blob
  * column immediately — features travel, bytes don't.
  */
object Multimodal {

  /** A blob row with typed metadata — the multimodal storage schema. */
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Extracted features (decode output batch shape). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           content_md5: String, feature: Array[Double])

  /** Wrap a text table as opaque binary media (test/demo source: UTF-8
    * bytes stand in for undecodable media bytes). */
  def asBinaryMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      // deterministic pseudo-kind so the pipeline exercises per-kind paths
      element_at(typedlit(Seq("image", "audio", "video")),
        (col(idCol) % 3 + 1).cast(IntegerType)).as("kind"),
      col(textCol).cast(BinaryType).as("content"))

  /** Expression-only metadata: computed at scan, no decode, no shuffle. */
  def withMetadata(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("content")).cast(LongType))
      .withColumn("content_md5", md5(col("content")))

  /** STUB decoder: a real implementation would parse the codec and emit
    * pixel/sample features. This fake derives a deterministic 4-dim
    * "embedding" from the content hash so downstream plumbing (schema,
    * batching, joins) is fully exercisable and reproducible. */
  object FakeDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val hex = md5hex(row.content)
      val feature = Array.tabulate(4) { j =>
        // same arithmetic as the SQL oracle: (h60(md5(bytes)#j) % 1000)/1000
        val hj = md5hex((hex + "#f" + j).getBytes("UTF-8"))
        java.lang.Long.parseLong(hj.substring(0, 15), 16) % 1000 / 1000.0
      }
      MediaFeatures(row.media_id, row.kind, row.content.length.toLong, hex, feature)
    }
  }

  /** One sampled video frame (frame payload hashed — a real decoder would
    * attach the pixel tensor). */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame_bytes: Long,
                        frame_md5: String)

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** STUB resize: a real implementation decodes pixels and rescales; the
    * stub stride-samples the byte payload down to ~targetBytes. Byte-level
    * media work lives in the `mapPartitions` decoder path (same place a
    * codec would run), NOT in SQL expressions — the plumbing (binary in,
    * smaller binary out, per-partition batching) is the real part. */
  def resizeStub(spark: SparkSession, media: DataFrame,
                 targetBytes: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.select("media_id", "kind", "content").as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val stride =
            math.max(1, (r.content.length + targetBytes - 1) / targetBytes)
          r.copy(content =
            r.content.grouped(stride).map(_.head).toArray)
        }
      }
  }

  /** STUB frame sampling for video-kind blobs: frames modeled as fixed-size
    * byte windows; keeps every `everyNth` frame as (index, size, hash). One
    * output row per kept frame — the explode-shaped decode that a real
    * keyframe sampler produces. */
  def frameSample(spark: SparkSession, media: DataFrame,
                  frameBytes: Int, everyNth: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    require(frameBytes > 0 && everyNth > 0)
    media.select("media_id", "kind", "content").as[MediaRow]
      .filter(_.kind == "video")
      .mapPartitions { it =>
        it.flatMap { r =>
          r.content.grouped(frameBytes).zipWithIndex.collect {
            case (frame, i) if i % everyNth == 0 =>
              MediaFrame(r.media_id, i, frame.length.toLong, md5hex(frame))
          }
        }
      }
  }

  /** Batch feature extraction: `mapPartitions` so decoder init happens once
    * per partition (the pandas-UDF batch analogue). Repartitions to
    * `parallelism` so blob batches are balanced regardless of upstream file
    * splits. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      parallelism: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val src = (if (parallelism > 0) media.repartition(parallelism) else media)
      .select("media_id", "kind", "content").as[MediaRow]
    src.mapPartitions { it =>
      // per-partition init would go here (codec context, model weights)
      it.map(FakeDecoder.decode)
    }
  }
}
