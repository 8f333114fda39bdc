package graft.llm

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}

/** Multimodal columns (BASELINE.json:6): image/audio/video as opaque
  * `binary` columns with typed metadata.
  *
  * The testdata ships no media, so the binary column is derived
  * (`CAST(text AS BINARY)`) and the *decode* step is a deterministic
  * fake (no media libs in this container — SURVEY.md §7 trap 7); the
  * Spark-side plumbing is real: binary schema, per-row metadata,
  * fixed-size frame sampling via explode, byte-level feature extraction
  * (`mm_byte_features`, a custom Catalyst expression in graft.ext).
  *
  * Scale posture: all per-row map-side work — no shuffle at all until an
  * (optional) aggregation; media blobs never serialize through a join.
  */
object Multimodal {

  def defs: Seq[(String, Q)] = Seq(
    "mm_meta" -> Q(
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_md5,
        |  substr(text, 1, 8) AS head
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // typed metadata over the opaque blob: byte length + checksum
      Tables.documents(s, d)
        .withColumn("blob", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("blob")).as("n_bytes"),
          md5(col("blob")).as("content_md5"),
          substring(col("text"), 1, 8).as("head"))
        .orderBy("doc_id")
    },

    // blob-level exact dedup (the image/audio dedup baseline): one hash
    // aggregation over content checksums, keep-min-id survivor rule —
    // a single shuffle of (md5, partials) at any corpus size
    "mm_dedup" -> Q(
      """SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY content_md5 ORDER BY content_md5""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("blob", col("text").cast("binary"))
        .groupBy(md5(col("blob")).as("content_md5"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("content_md5")
    },

    "mm_byte_features" -> Q(
      """SELECT doc_id, length(text) AS n_bytes,
        |  (CAST(list_aggregate(list_transform(generate_series(1, length(text)),
        |     i -> ord(substr(text, i, 1))), 'sum') AS DOUBLE) / length(text)) AS mean_byte,
        |  list_min(list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1)))) AS min_byte,
        |  list_max(list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1)))) AS max_byte
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // the "decode" step: graft.ext.ByteStats (custom Catalyst
      // expression, binary → feature struct); ASCII text makes the byte
      // features reproducible in the oracle via ord()
      graft.ext.Ext.register(s)
      Tables.documents(s, d)
        .withColumn("f", expr("byte_stats(CAST(text AS BINARY))"))
        .select(col("doc_id"), col("f.n_bytes").as("n_bytes"),
          col("f.mean_byte").as("mean_byte"), col("f.min_byte").as("min_byte"),
          col("f.max_byte").as("max_byte"))
        .orderBy("doc_id")
    },

    "mm_resize" -> Q(
      """SELECT doc_id,
        |  length(rpad(substr(text, 1, 128), 128, ' ')) AS resized_len,
        |  md5(rpad(substr(text, 1, 128), 128, ' ')) AS resized_md5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // "resize to a fixed frame": truncate-or-pad the blob to 128 bytes
      // — the deterministic stand-in for an image resize; shape (fixed
      // output size per row, map-side only) is what matters
      val resized = rpad(substring(col("text"), 1, 128), 128, " ")
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(resized).as("resized_len"),
          md5(resized.cast("binary")).as("resized_md5"))
        .orderBy("doc_id")
    },

    "mm_frame_sample" -> Q(
      """SELECT doc_id, fi AS frame_idx,
        |  md5(substr(text, fi * 64 + 1, 64)) AS frame_md5
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, (length(text) - 1) // 64)) AS fi
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      // frame sampling: fixed-size windows over the blob via explode —
      // the 1-row→n-frames generator shape a video pipeline needs
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), floor((length(col("text")) - 1) / 64).cast("int")))
            .as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          md5(expr("substring(text, frame_idx * 64 + 1, 64)").cast("binary")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    }
  )
}
