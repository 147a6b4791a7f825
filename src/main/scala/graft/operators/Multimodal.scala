package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary`
  * columns with typed metadata alongside. The container has no
  * image/audio codecs, so the decode step is a clearly-marked
  * deterministic STUB — the Spark-side shape (binary column, schema,
  * partition-parallel batch decode via mapPartitions, fixed-width
  * feature output) is real and tested.
  *
  * At 100 TB: binary payloads live in their own parquet column (never
  * projected unless decoded), decode runs partition-parallel with no
  * shuffle, and feature vectors come back as fixed-width arrays ready
  * for the Similarity operators.
  */
object Multimodal {

  /** STUB decoder: stands in for an image/audio codec. Deterministic
    * byte statistics over the payload, 4-wide "feature". A real system
    * would replace only this function (e.g. JNI codec / ONNX encoder);
    * everything around it — schema, batching, partitioning — stays.
    */
  private[operators] def decodeStub(payload: Array[Byte]): Array[Double] = {
    var sum = 0L; var min = 255; var max = 0
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b; if (b < min) min = b; if (b > max) max = b
      i += 1
    }
    val n = math.max(payload.length, 1)
    Array(payload.length.toDouble, sum.toDouble / n, min.toDouble, max.toDouble)
  }

  val defs: Seq[QueryDef] = Seq(
    // ---- q50: binary column + typed metadata (oracle-checked) ----------
    QueryDef(
      "q50_multimodal_meta",
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
          .select(
            col("doc_id"),
            length(col("blob")).as("n_bytes"),
            upper(substring(hex(col("blob")), 1, 16)).as("header_hex"),
            md5(col("blob")).as("content_md5")),
      Some("""SELECT doc_id,
             |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
             |  upper(substr(hex(CAST(text AS BLOB)), 1, 16)) AS header_hex,
             |  md5(text) AS content_md5
             |FROM documents""".stripMargin)),

    // ---- q52: frame sampling (video-style chunking plumbing) -----------
    // A media payload decomposed into fixed-size frames, each carrying
    // (position, size, content hash) — the batch shape a video
    // frame-sampler produces. Chunking is over the payload itself;
    // no shuffle, parallel per partition.
    QueryDef(
      "q52_frame_sample",
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"), col("text"),
            explode(expr(
              "sequence(0, cast(ceil(length(text) / 256.0) as int) - 1)"))
              .as("frame_no"))
          .select(
            col("doc_id"), col("frame_no"),
            length(expr("substr(text, frame_no * 256 + 1, 256)")).as("frame_len"),
            md5(expr("substr(text, frame_no * 256 + 1, 256)")).as("frame_md5")),
      Some("""SELECT doc_id, g.f AS frame_no,
             |  CAST(length(substr(text, g.f * 256 + 1, 256)) AS INTEGER) AS frame_len,
             |  md5(substr(text, g.f * 256 + 1, 256)) AS frame_md5
             |FROM documents,
             |  UNNEST(generate_series(0, CAST(ceil(length(text) / 256.0) AS INTEGER) - 1)) AS g(f)""".stripMargin)),

    // ---- q51: partition-parallel stub decode (rows-only check) ---------
    // The mapPartitions boundary is where a real batched decoder sits;
    // output is (doc_id, fixed-width feature vector + scalar stats).
    QueryDef(
      "q51_multimodal_decode",
      (s, d) => {
        import s.implicits._
        Tables(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            it.map { case (id, payload) =>
              val f = decodeStub(payload)
              (id, f, f.length)
            }
          }
          .toDF("doc_id", "feature", "feature_dim")
      },
      None)
  )
}
