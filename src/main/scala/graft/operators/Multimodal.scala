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

    // ---- q62: resize stub (downscale plumbing) -------------------------
    // Stands in for an image resize/downscale: the payload is cropped
    // to its leading quarter (a deterministic stub — a real resize
    // replaces just this projection with a codec call; the shape,
    // metadata contract, and no-shuffle scan stay). Output carries the
    // before/after sizes and the content hash of the resized payload —
    // what a thumbnailing pass materializes next to the original.
    QueryDef(
      "q62_resize_stub",
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
          .withColumn("nb", length(col("blob")))
          .select(
            col("doc_id"),
            col("nb").as("orig_bytes"),
            expr("cast((nb + 3) div 4 as int)").as("new_bytes"),
            md5(expr("substring(blob, 1, (nb + 3) div 4)")).as("resized_md5")),
      // DuckDB's md5/substr are VARCHAR-only; the fixture corpus is
      // ASCII so byte offsets == char offsets and the text crop
      // hashes identically to the Spark-side binary crop (same
      // equivalence q50's header_hex oracle relies on).
      Some("""SELECT doc_id,
             |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS orig_bytes,
             |  CAST((octet_length(CAST(text AS BLOB)) + 3) // 4 AS INTEGER) AS new_bytes,
             |  md5(substr(text, 1, (length(text) + 3) // 4)) AS resized_md5
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

    // ---- q51: partition-parallel stub decode (oracle-checked) ----------
    // The mapPartitions boundary is where a real batched decoder sits.
    // The fixed-width feature comes back as one scalar column per
    // dimension (f0..f3) — scalars hash/sort cleanly downstream, and
    // the byte statistics the stub computes are exactly reproducible
    // in SQL (integer sum / single double division), so the decode
    // path is fully oracle-checked, not just rows-counted.
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
              (id, f(0), f(1), f(2), f(3), f.length)
            }
          }
          .toDF("doc_id", "n_bytes", "mean_byte", "min_byte", "max_byte",
            "feature_dim")
          .withColumn("mean_byte", round(col("mean_byte"), 4))
      },
      // Byte values via hex pairs: byte i of the blob == hex digits
      // (2i-1, 2i) — engine-neutral, unlike ord() (code points).
      Some("""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
             |                  octet_length(encode(text)) AS n
             |           FROM documents),
             |bytes AS (SELECT doc_id,
             |            ('0x' || substr(hx, 2 * g.i - 1, 2))::BIGINT AS bv
             |          FROM h, UNNEST(generate_series(1, n)) AS g(i)),
             |agg AS (SELECT doc_id,
             |          CAST(count(*) AS DOUBLE) AS n_bytes,
             |          round(CAST(sum(bv) AS BIGINT) / count(*), 4) AS mean_byte,
             |          CAST(min(bv) AS DOUBLE) AS min_byte,
             |          CAST(max(bv) AS DOUBLE) AS max_byte
             |        FROM bytes GROUP BY 1)
             |SELECT h.doc_id,
             |  coalesce(a.n_bytes, 0.0) AS n_bytes,
             |  coalesce(a.mean_byte, 0.0) AS mean_byte,
             |  coalesce(a.min_byte, 255.0) AS min_byte,
             |  coalesce(a.max_byte, 0.0) AS max_byte,
             |  4 AS feature_dim
             |FROM h LEFT JOIN agg a USING (doc_id)""".stripMargin))
  )
}
