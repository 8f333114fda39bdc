package graft.llm

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}

/** Multimodal columns (BASELINE.json:6): image/audio/video as opaque
  * `binary` columns with typed metadata.
  *
  * The testdata ships no media, so most entries derive the binary
  * column (`CAST(text AS BINARY)`) with deterministic byte-level
  * stand-ins for the codec step (no media libs in this container —
  * SURVEY.md §7 trap 7); `mm_decode_jpeg` (r17) is the REAL decode:
  * baseline-JPEG blobs through the in-repo zonal/Jpeg.scala codec via
  * Spark's binaryFile source. The Spark-side plumbing is real
  * throughout: binary schema, per-row metadata, fixed-size frame
  * sampling via explode, byte-level feature extraction
  * (`mm_byte_features`, a custom Catalyst expression in graft.ext).
  *
  * Scale posture: all per-row map-side work — no shuffle at all until an
  * (optional) aggregation; media blobs never serialize through a join.
  */
object Multimodal {

  /** REAL-decode fixture geometry (r17): [[MmJpegN]] baseline-JPEG
    * blobs of [[MmJpegW]]×[[MmJpegH]] gray, each 8×8 block CONSTANT at
    * [[mmJpegLuma]] — the block-constant discipline (a constant block
    * has only a DC coefficient that the DC quant step divides exactly,
    * so encode∘decode is bit-exact and the formula oracle hash-gates
    * the full blob → pixels path).
    */
  val MmJpegN = 16
  val MmJpegW = 32
  val MmJpegH = 24
  def mmJpegLuma(k: Int, bx: Int, by: Int): Int =
    (17 * bx + 29 * by + 41 * k + 3) % 251

  /** Write-once blob directory: one standalone .jpg per image. */
  def jpegBlobDir(): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_io/mm_jpeg_blobs"
    graft.zonal.Raster.fixtureOnce("mm_jpeg_blobs_marker") { _ =>
      graft.core.Fs.rmTree(dir)
      new java.io.File(dir).mkdirs()
      for (k <- 0 until MmJpegN) {
        val px = Array.tabulate(MmJpegW * MmJpegH)(i =>
          mmJpegLuma(k, (i % MmJpegW) / 8, (i / MmJpegW) / 8))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, f"img_$k%03d.jpg"),
          graft.zonal.Jpeg.encodeGray(px, MmJpegW, MmJpegH))
      }
    }
    dir
  }

  /** REAL JPEG decode over a blob column (r17 — verdict missing #7:
    * `mm_byte_features` was the declared stub decoder while a real
    * baseline-JPEG codec lived in zonal/Jpeg.scala; this wires them):
    * Spark's `binaryFile` source reads the blobs, each decodes ONCE
    * per row via the in-repo Huffman+IDCT path (the codec is itself
    * oracle-gated through scan_raster_jpeg), and per-8×8-block
    * mean/min/max luma surface long-form. Pure map-side flatMap —
    * blobs never serialize through a join or shuffle; dims stay with
    * their row.
    */
  def decodeJpegBlobs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", "*.jpg").load(dir)
      .select(regexp_extract(col("path"), "img_(\\d+)\\.jpg", 1)
        .cast("long").as("img_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        val (w, h, px) = graft.zonal.Jpeg.decodeGray(blob)
        for (by <- 0 until h / 8; bx <- 0 until w / 8) yield {
          var sum = 0L; var mn = 255; var mx = 0
          for (yy <- 0 until 8; xx <- 0 until 8) {
            val v = px((by * 8 + yy) * w + bx * 8 + xx)
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          }
          (id, w, h, bx, by, sum / 64.0, mn, mx)
        }
      }
      .toDF("img_id", "width", "height", "bx", "by",
        "block_mean", "block_min", "block_max")
  }

  /** PNG twin of the JPEG blob fixture (r20): PNG is LOSSLESS, so the
    * block-constant discipline is free — but the y%5 default filter
    * rotation makes every scanline filter (None/Sub/Up/Average/Paeth)
    * part of the oracle-gated path.
    */
  def mmPngLuma(k: Int, bx: Int, by: Int): Int =
    (19 * bx + 23 * by + 43 * k + 7) % 251

  def pngBlobDir(): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_io/mm_png_blobs"
    graft.zonal.Raster.fixtureOnce("mm_png_blobs_marker") { _ =>
      graft.core.Fs.rmTree(dir)
      new java.io.File(dir).mkdirs()
      for (k <- 0 until MmJpegN) {
        val px = Array.tabulate(MmJpegW * MmJpegH)(i =>
          mmPngLuma(k, (i % MmJpegW) / 8, (i / MmJpegW) / 8))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, f"img_$k%03d.png"),
          graft.zonal.Png.encodeGray(px, MmJpegW, MmJpegH))
      }
    }
    dir
  }

  /** REAL PNG decode over a blob column (r20 — VERDICT r19 next-#6):
    * same shape as [[decodeJpegBlobs]] through the from-spec
    * zonal/Png.scala codec (zlib inflate + all five scanline
    * unfilters); pure map-side flatMap, blobs never cross a shuffle.
    */
  def decodePngBlobs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", "*.png").load(dir)
      .select(regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
        .cast("long").as("img_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        val (w, h, px) = graft.zonal.Png.decodeGray(blob)
        for (by <- 0 until h / 8; bx <- 0 until w / 8) yield {
          var sum = 0L; var mn = 255; var mx = 0
          for (yy <- 0 until 8; xx <- 0 until 8) {
            val v = px((by * 8 + yy) * w + bx * 8 + xx)
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          }
          (id, w, h, bx, by, sum / 64.0, mn, mx)
        }
      }
      .toDF("img_id", "width", "height", "bx", "by",
        "block_mean", "block_min", "block_max")
  }

  /** Truecolour twin (r20): per-channel block formulas — the RGB
    * sample interleave and the bpp=3 filter offsets are on the gated
    * path (a channel swap or a bpp-1 filter bug hash-fails).
    */
  def mmPngR(k: Int, bx: Int, by: Int): Int = (11 * bx + 17 * by + 19 * k + 1) % 251
  def mmPngG(k: Int, bx: Int, by: Int): Int = (7 * bx + 29 * by + 23 * k + 2) % 251
  def mmPngB(k: Int, bx: Int, by: Int): Int = (13 * bx + 5 * by + 37 * k + 3) % 251

  def pngRgbBlobDir(): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_io/mm_png_rgb_blobs"
    graft.zonal.Raster.fixtureOnce("mm_png_rgb_blobs_marker") { _ =>
      graft.core.Fs.rmTree(dir)
      new java.io.File(dir).mkdirs()
      for (k <- 0 until MmJpegN) {
        val px = Array.tabulate(MmJpegW * MmJpegH) { i =>
          val bx = (i % MmJpegW) / 8; val by = (i / MmJpegW) / 8
          (mmPngR(k, bx, by) << 16) | (mmPngG(k, bx, by) << 8) | mmPngB(k, bx, by)
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, f"img_$k%03d.png"),
          graft.zonal.Png.encodeRgb(px, MmJpegW, MmJpegH))
      }
    }
    dir
  }

  /** 16-bit grayscale twin (r20 — the DEM/elevation PNG form): values
    * above 255 prove the big-endian sample pairs and the bpp=2 filter
    * offsets are on the gated path.
    */
  def mmPng16(k: Int, bx: Int, by: Int): Int =
    (1234 * k + 517 * bx + 263 * by + 11) % 60001

  def png16BlobDir(): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_io/mm_png16_blobs"
    graft.zonal.Raster.fixtureOnce("mm_png16_blobs_marker") { _ =>
      graft.core.Fs.rmTree(dir)
      new java.io.File(dir).mkdirs()
      for (k <- 0 until MmJpegN) {
        val px = Array.tabulate(MmJpegW * MmJpegH)(i =>
          mmPng16(k, (i % MmJpegW) / 8, (i / MmJpegW) / 8))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, f"img_$k%03d.png"),
          graft.zonal.Png.encodeGray16(px, MmJpegW, MmJpegH))
      }
    }
    dir
  }

  def defs: Seq[(String, Q)] = Seq(
    // 16-BIT grayscale PNG decode (r20 — the DEM/elevation container):
    // big-endian sample pairs + bpp=2 byte-wise filters through the
    // same from-spec codec; block values up to 60000 overflow any
    // 8-bit misread, so a depth/stride bug hash-fails loudly
    "mm_decode_png16" -> Q(
      s"""SELECT k.range AS img_id, x.range AS bx, y.range AS by,
         |  CAST((1234 * k.range + 517 * x.range + 263 * y.range + 11) % 60001 AS DOUBLE) AS block_mean,
         |  (1234 * k.range + 517 * x.range + 263 * y.range + 11) % 60001 AS block_min,
         |  (1234 * k.range + 517 * x.range + 263 * y.range + 11) % 60001 AS block_max
         |FROM range(0, $MmJpegN) k CROSS JOIN range(0, ${MmJpegW / 8}) x
         |  CROSS JOIN range(0, ${MmJpegH / 8}) y
         |ORDER BY img_id, by, bx""".stripMargin) { (s, _) =>
      import s.implicits._
      s.read.format("binaryFile").option("pathGlobFilter", "*.png")
        .load(png16BlobDir())
        .select(regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
          .cast("long").as("img_id"), col("content"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, blob) =>
          val (w, h, px) = graft.zonal.Png.decodeGray16(blob)
          for (by <- 0 until h / 8; bx <- 0 until w / 8) yield {
            var sum = 0L; var mn = 65535; var mx = 0
            for (yy <- 0 until 8; xx <- 0 until 8) {
              val v = px((by * 8 + yy) * w + bx * 8 + xx)
              sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            }
            (id, bx, by, sum / 64.0, mn, mx)
          }
        }
        .toDF("img_id", "bx", "by", "block_mean", "block_min", "block_max")
        .orderBy("img_id", "by", "bx")
    },

    // TRUECOLOUR PNG decode (r20): the dominant real-corpus PNG shape —
    // packed RGB through the same from-spec codec; per-block per-CHANNEL
    // means gate the sample interleave and the bpp=3 filter offsets
    "mm_decode_png_rgb" -> Q(
      s"""SELECT k.range AS img_id, x.range AS bx, y.range AS by,
         |  CAST((11 * x.range + 17 * y.range + 19 * k.range + 1) % 251 AS DOUBLE) AS r_mean,
         |  CAST((7 * x.range + 29 * y.range + 23 * k.range + 2) % 251 AS DOUBLE) AS g_mean,
         |  CAST((13 * x.range + 5 * y.range + 37 * k.range + 3) % 251 AS DOUBLE) AS b_mean
         |FROM range(0, $MmJpegN) k CROSS JOIN range(0, ${MmJpegW / 8}) x
         |  CROSS JOIN range(0, ${MmJpegH / 8}) y
         |ORDER BY img_id, by, bx""".stripMargin) { (s, _) =>
      import s.implicits._
      s.read.format("binaryFile").option("pathGlobFilter", "*.png")
        .load(pngRgbBlobDir())
        .select(regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
          .cast("long").as("img_id"), col("content"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, blob) =>
          val (w, h, px) = graft.zonal.Png.decodeRgb(blob)
          for (by <- 0 until h / 8; bx <- 0 until w / 8) yield {
            var (sr, sg, sb) = (0L, 0L, 0L)
            for (yy <- 0 until 8; xx <- 0 until 8) {
              val v = px((by * 8 + yy) * w + bx * 8 + xx)
              sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
            }
            (id, bx, by, sr / 64.0, sg / 64.0, sb / 64.0)
          }
        }
        .toDF("img_id", "bx", "by", "r_mean", "g_mean", "b_mean")
        .orderBy("img_id", "by", "bx")
    },

    // REAL PNG decode for multimodal blobs (r20 — the other ubiquitous
    // training-corpus image container next to mm_decode_jpeg): blobs
    // through the from-spec codec — signature, chunk CRCs, zlib IDAT,
    // all five scanline filters (the y%5 rotation puts every filter on
    // the gated path); lossless, so the formula replay hash-gates the
    // ENTIRE blob → pixel path with no block-constant crutch needed
    "mm_decode_png" -> Q(
      s"""SELECT k.range AS img_id, $MmJpegW AS width, $MmJpegH AS height,
         |  x.range AS bx, y.range AS by,
         |  CAST((19 * x.range + 23 * y.range + 43 * k.range + 7) % 251 AS DOUBLE) AS block_mean,
         |  (19 * x.range + 23 * y.range + 43 * k.range + 7) % 251 AS block_min,
         |  (19 * x.range + 23 * y.range + 43 * k.range + 7) % 251 AS block_max
         |FROM range(0, $MmJpegN) k CROSS JOIN range(0, ${MmJpegW / 8}) x
         |  CROSS JOIN range(0, ${MmJpegH / 8}) y
         |ORDER BY img_id, by, bx""".stripMargin) { (s, _) =>
      decodePngBlobs(s, pngBlobDir()).orderBy("img_id", "by", "bx")
    },
    // REAL JPEG decode for multimodal blobs (r17): binaryFile source →
    // in-repo baseline decoder → per-block luma stats; the
    // block-constant fixture makes encode∘decode exact, so the DuckDB
    // formula replay gates the ENTIRE blob → pixel path (a Huffman,
    // dequant, IDCT or indexing bug anywhere hash-mismatches)
    "mm_decode_jpeg" -> Q(
      s"""SELECT k.range AS img_id, $MmJpegW AS width, $MmJpegH AS height,
         |  x.range AS bx, y.range AS by,
         |  CAST((17 * x.range + 29 * y.range + 41 * k.range + 3) % 251 AS DOUBLE) AS block_mean,
         |  (17 * x.range + 29 * y.range + 41 * k.range + 3) % 251 AS block_min,
         |  (17 * x.range + 29 * y.range + 41 * k.range + 3) % 251 AS block_max
         |FROM range(0, $MmJpegN) k CROSS JOIN range(0, ${MmJpegW / 8}) x
         |  CROSS JOIN range(0, ${MmJpegH / 8}) y
         |ORDER BY img_id, by, bx""".stripMargin) { (s, _) =>
      decodeJpegBlobs(s, jpegBlobDir()).orderBy("img_id", "by", "bx")
    },

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
    // needs a locality-sensitive signature): the PUBLISHED 64-bit
    // SimHash split into 4 × 16-bit segments (Manku, Jain & Das Sarma,
    // WWW 2007 — the web-scale shape; round 7 shipped a 16-bit/3-seg
    // variant whose 32-64 total buckets were quadratic at scale; 16-bit
    // segments give 65 536 buckets per segment) over sliding 8-byte
    // shingles hashed with the engine-portable poly_hash — so unlike
    // dedup_simhash (xxhash64, no DuckDB twin) this signature IS
    // oracle-replayable. The 64 bit votes are 64 conditional sums
    // inside ONE hash aggregate (no ×64 row blowup); candidate pairs
    // come from the 4-segment pigeonhole bucket-collect — at Hamming
    // ≤ 3 at most 3 segments differ, so one matches EXACTLY and recall
    // is guaranteed by construction; verify = summed per-segment
    // bit_count(xor) on candidates, and a mega-bucket past the cap
    // raises IN-PLAN before any pair is emitted (the r6 text-side
    // guard, extended here per the round-7 verdict).
    "mm_near_dup" -> Q(MmNearDupSql) { (s, d) =>
      mmNearDupPairs(Tables.documents(s, d), graft.llm.Dedup.bucketCap(s))
    }
  )

  /** 64 bits = 4 derived 16-bit hash views of the shingle's poly_hash,
    * avalanche-mixed (round-9 verdict: the earlier single linear
    * congruence h_k = (A_k·h+B_k) mod M left the four views linearly
    * correlated — e.g. bit j of 3h+1 and 5h+2 agree far more than half
    * the time — so the 64-bit signature carried well under 64 effective
    * bits and candidate rates inflated at scale).
    *
    * Mix (identical arithmetic on both engines, the in-plan analogue of
    * the Scala-side [[graft.llm.Sim]] planeWeight avalanche):
    *   y₀ = (A_k·h + B_k) mod M        — h < M ≈ 2^30, product < 2^60
    *   y₁ = y₀ xor (y₀ >> 15)          — fold high entropy into low bits
    *   y₂ = (C_k·y₁ + D_k) mod M       — second multiply round
    *   h_k = y₂ xor (y₂ >> 15)         — bits 0..15 used for the vote
    * Every intermediate stays < 2^30, so no BIGINT overflow under ANSI
    * on Spark or DuckDB. Constants are arbitrary large odds < M, local
    * to this op (Dedup.HashA/B stay untouched — minhash oracles pin
    * them).
    */
  private val MixA = Seq(787697071L, 908041399L, 667623619L, 533000401L)
  private val MixB = Seq(241291L, 514229L, 741721L, 986533L)
  private val MixC = Seq(997525853L, 727595923L, 871396357L, 613651349L)
  private val MixD = Seq(323467L, 178291L, 912391L, 462847L)

  /** The mixed view as an SQL expression over column/expr `h`.
    * `xorOp(a, b)` and `shr(a, n)` abstract the two engines' spellings
    * (Spark: `a ^ b`, `shiftright(a, n)`; DuckDB: `xor(a, b)`, `a >> n`).
    */
  private def mixSql(k: Int, h: String,
      xorOp: (String, String) => String, shr: (String, Int) => String): String = {
    val m = graft.llm.Dedup.HashMod
    val y0 = s"((${MixA(k)} * $h + ${MixB(k)}) % $m)"
    val y1 = s"(${xorOp(y0, shr(y0, 15))})"
    val y2 = s"((${MixC(k)} * $y1 + ${MixD(k)}) % $m)"
    s"(${xorOp(y2, shr(y2, 15))})"
  }
  private def mixSpark(k: Int, h: String): String =
    mixSql(k, h, (a, b) => s"$a ^ $b", (a, n) => s"shiftright($a, $n)")
  private def mixDuck(k: Int, h: String): String =
    mixSql(k, h, (a, b) => s"xor($a, $b)", (a, n) => s"($a >> $n)")

  /** Pure-Scala twin of the SQL mix, exposed for LlmSpec's
    * decorrelation property (per-bit cross-view agreement ≈ 1/2).
    */
  def mixedView(k: Int, h: Long): Long = {
    val m = graft.llm.Dedup.HashMod
    val y0 = (MixA(k) * h + MixB(k)) % m
    val y1 = y0 ^ (y0 >> 15)
    val y2 = (MixC(k) * y1 + MixD(k)) % m
    y2 ^ (y2 >> 15)
  }

  /** Spark body of mm_near_dup, parameterized so EdgeSpec can drive a
    * degenerate corpus into the mega-bucket guard.
    *
    * Shingle distinct is per-doc BY DEFINITION, so array_distinct runs
    * MAP-SIDE in the scan projection; the distinct hashes leave the
    * scan as exploded LONGS and fold straight into ONE codegen'd hash
    * aggregate (partial map-side, one narrow shuffle of ≤ ndocs×64
    * partial rows). A pure-HOF aggregate() fold was tried in r7 and
    * measured 4× SLOWER. Texts shorter than the 8-byte shingle are
    * filtered on BOTH engines (Spark's sequence(1, len-7) turns
    * DESCENDING below len 8 — bogus shingles — while DuckDB's
    * generate_series yields an empty list: a silent cross-engine
    * divergence flagged in round-7 advice).
    */
  def mmNearDupPairs(docs: org.apache.spark.sql.DataFrame, cap: Int): org.apache.spark.sql.DataFrame = {
    graft.ext.Ext.register(docs.sparkSession)
    // the 4 avalanche-mixed hash views are computed ONCE in the
    // projection below the aggregate — referencing them inside all 64
    // conditional sums would evaluate the mix 64× per shingle (no CSE
    // across aggregate expressions)
    // r11 reformulation: the per-shingle work inside the aggregate is 64
    // BRANCH-FREE bit sums (shift + and, no CASE) plus one count; the
    // majority vote — sum(±1) >= 0 ⇔ 2·ones >= n, identical arithmetic —
    // moves to a post-agg projection over ndocs rows instead of nshingles
    val bitSums = (for (k <- 0 until 4; j <- 0 until 16) yield
      sum(expr(s"(shiftright(h$k, $j) & 1)")).as(s"c${k}_$j")) :+ count(lit(1)).as("cnt")
    val segCols = (0 until 4).map { k =>
      val terms = (0 until 16).map(j =>
        s"(CASE WHEN 2 * c${k}_$j >= cnt THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      expr(s"CAST($terms AS BIGINT)").as(s"s$k")
    }
    val hViews = (0 until 4).map(k => expr(mixSpark(k, "h")).as(s"h$k"))
    // r21 perf: ROLLING poly_hash_shingles (O(len), zero per-window
    // substring allocations) replaces the transform+substring spelling
    // (O(len·8) plus one UTF8String per window) — element k is
    // poly_hash(substring(text, k+1, 8)) EXACTLY (ExtSpec pins it), so
    // the signature, the candidates, and the oracle are unchanged; the
    // same swap took dedup_substring's shingle stage from 8 s to
    // sub-second in r17.
    val sig = docs
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), explode(expr(
        "array_distinct(poly_hash_shingles(text, 8))")).as("h"))
      .select(col("doc_id") +: hViews: _*)
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id") +: segCols: _*)
    val segs = sig.select(col("doc_id"), col("s0"), col("s1"), col("s2"), col("s3"),
        explode(expr(
          """array(struct(0 AS si, s0 AS sv), struct(1 AS si, s1 AS sv),
            |      struct(2 AS si, s2 AS sv), struct(3 AS si, s3 AS sv))""".stripMargin)).as("g"))
      .select(col("doc_id"), col("s0"), col("s1"), col("s2"), col("s3"),
        col("g.si"), col("g.sv"))
    // r21 (guide §2.4, the signCandidatesOf rule): bucket-collect pair
    // enumeration — the counts join + guarded self-equi-join evaluated
    // the SimHash signature aggregate (explode shingles + 64 bit sums
    // over every shingle, the op's dominant cost) FOUR times; this
    // spelling evaluates it ONCE. sort_array on (doc_id, s0..s3)
    // structs orders by doc_id, so the i<j explode emits id1 < id2
    // exactly as the self-join did; the same cap guards the in-bucket
    // product in-plan before any pair is assembled.
    // r22 ([[graft.ext.BoundedCollectList]] via [[graft.llm.Buckets]],
    // VERDICT r21 wrong-#2): cap enforced DURING accumulation — no
    // buffer ever materializes a mega bucket; chunked pair enumeration.
    graft.llm.Buckets.pairsAB(
      graft.llm.Buckets.guardedCollect(segs, Seq("si", "sv"),
        struct(col("doc_id"), col("s0"), col("s1"), col("s2"), col("s3")), cap,
        s"SimHash mega-bucket: more than $cap blobs share one 16-bit " +
          "segment (cap " + cap + ") — a degenerate corpus region; remove " +
          "exact duplicates upstream (mm_dedup) or raise " +
          "spark.graft.lsh.maxBucket"),
      Seq("si", "sv"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        expr("""CAST(bit_count(a.s0 ^ b.s0) + bit_count(a.s1 ^ b.s1)
          |  + bit_count(a.s2 ^ b.s2) + bit_count(a.s3 ^ b.s3) AS INT)""".stripMargin)
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("id1", "id2")
  }

  /** DuckDB twin of mm_near_dup: identical shingle/vote/segment
    * arithmetic (poly_hash fold, 4 derived hash views, 64 conditional
    * sums, 4×16-bit pigeonhole, per-segment bit_count(xor) verify).
    */
  private lazy val MmNearDupSql: String = {
    // identical bit-sum/majority arithmetic as the Spark side (r11:
    // 2·ones >= n is the same predicate as the old ±1 vote >= 0)
    val segSums = (0 until 4).map { k =>
      val terms = (0 until 16).map { j =>
        s"(CASE WHEN 2 * sum((h$k >> $j) & 1) >= count(*)" +
          s" THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"CAST($terms AS BIGINT) AS s$k"
    }.mkString(",\n    ")
    val hViews = (0 until 4).map(k => s"${mixDuck(k, "h")} AS h$k").mkString(", ")
    val segUnion = (0 until 4).map(k =>
      s"SELECT doc_id, s0, s1, s2, s3, $k AS si, s$k AS sv FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH hs AS (
       |  SELECT DISTINCT doc_id, h FROM (
       |    SELECT doc_id, ${graft.llm.Dedup.polyHashSql("g")} AS h FROM (
       |      SELECT doc_id, unnest(list_transform(generate_series(1, length(text) - 7),
       |        i -> substr(text, i, 8))) AS g
       |      FROM documents WHERE length(text) >= 8))),
       |hv AS (SELECT doc_id, $hViews FROM hs),
       |sig AS (SELECT doc_id,
       |    $segSums
       |  FROM hv GROUP BY doc_id),
       |segs AS (
       |  $segUnion),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |    CAST(bit_count(xor(a.s0, b.s0)) + bit_count(xor(a.s1, b.s1))
       |       + bit_count(xor(a.s2, b.s2)) + bit_count(xor(a.s3, b.s3)) AS INTEGER) AS hamming
       |  FROM segs a JOIN segs b
       |    ON a.si = b.si AND a.sv = b.sv AND a.doc_id < b.doc_id)
       |SELECT id1, id2, hamming FROM cand WHERE hamming <= 3
       |ORDER BY id1, id2""".stripMargin
  }
}
