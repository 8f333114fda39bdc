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
    },

    // byte-level NEAR-dup for opaque blobs (the perceptual-hash shape:
    // mm_dedup catches only bit-identical content; re-encoded media
    // needs a locality-sensitive signature): 16-bit SimHash over
    // sliding 8-byte shingles hashed with the engine-portable
    // poly_hash — so unlike dedup_simhash (xxhash64, no DuckDB twin)
    // this signature IS oracle-replayable. The 16 bit votes are 16
    // conditional sums inside ONE hash aggregate (no ×16 row blowup);
    // candidate pairs come from a 3-segment (6+5+5 bit) pigeonhole
    // equi-join — at Hamming ≤ 2 at most 2 segments differ, so one
    // matches EXACTLY and recall is guaranteed by construction (the
    // text_hamming_pairs rule); verify = bit_count(xor) on candidates.
    "mm_near_dup" -> Q(MmNearDupSql) { (s, d) =>
      graft.ext.Ext.register(s)
      // shingle distinct is per-doc BY DEFINITION, so array_distinct
      // runs it MAP-SIDE in the scan projection — the old
      // explode+distinct+groupBy spelling shuffled the full shingle
      // volume twice; here the 1.5M distinct hashes leave the scan as
      // exploded LONGS (not strings) and fold straight into ONE
      // codegen'd hash aggregate (partial map-side, one narrow
      // shuffle of ≤ ndocs×16 partial rows). A pure-HOF aggregate()
      // fold was tried and measured 4× SLOWER: each lambda step
      // allocates a fresh 16-element boxed array per shingle. Dedup
      // is on the HASH, mirrored in the oracle — identical semantics
      // on both engines even under a collision.
      val sigTermsSpark = (0 until 16).map { j =>
        s"(CASE WHEN sum(CASE WHEN (h div ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) >= 0" +
          s" THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      val sig = Tables.documents(s, d)
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(sequence(1, length(text) - 7),
            |  i -> poly_hash(substring(text, i, 8))))""".stripMargin)).as("h"))
        .groupBy("doc_id")
        .agg(expr(s"CAST($sigTermsSpark AS BIGINT)").as("sig"))
      val segs = sig.select(col("doc_id"), col("sig"),
          explode(expr(
            """array(struct(0 AS si, sig % 32 AS sv),
              |      struct(1 AS si, (sig div 32) % 32 AS sv),
              |      struct(2 AS si, sig div 1024 AS sv))""".stripMargin)).as("seg"))
        .select(col("doc_id"), col("sig"), col("seg.si"), col("seg.sv"))
      segs.as("a").join(segs.as("b"),
          col("a.si") === col("b.si") && col("a.sv") === col("b.sv")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          expr("CAST(bit_count(CAST(a.sig AS INT) ^ CAST(b.sig AS INT)) AS INT)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 2)
        .orderBy("id1", "id2")
    }
  )

  /** DuckDB twin of mm_near_dup: identical shingle/vote/segment
    * arithmetic (poly_hash fold, 16 conditional sums, 3-segment
    * pigeonhole, bit_count(xor) verify).
    */
  private lazy val MmNearDupSql: String = {
    val sigTerms = (0 until 16).map { j =>
      s"(CASE WHEN sum(CASE WHEN (h // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) >= 0" +
        s" THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH hs AS (
       |  SELECT DISTINCT doc_id, h FROM (
       |    SELECT doc_id, ${graft.llm.Dedup.polyHashSql("g")} AS h FROM (
       |      SELECT doc_id, unnest(list_transform(generate_series(1, length(text) - 7),
       |        i -> substr(text, i, 8))) AS g
       |      FROM documents))),
       |sig AS (SELECT doc_id, CAST($sigTerms AS BIGINT) AS sig FROM hs GROUP BY doc_id),
       |segs AS (
       |  SELECT doc_id, sig, 0 AS si, sig % 32 AS sv FROM sig
       |  UNION ALL SELECT doc_id, sig, 1, (sig // 32) % 32 FROM sig
       |  UNION ALL SELECT doc_id, sig, 2, sig // 1024 FROM sig),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |  FROM segs a JOIN segs b
       |    ON a.si = b.si AND a.sv = b.sv AND a.doc_id < b.doc_id)
       |SELECT id1, id2, hamming FROM cand WHERE hamming <= 2
       |ORDER BY id1, id2""".stripMargin
  }
}
