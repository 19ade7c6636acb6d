package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.{Codecs, Multimodal}

/** Round-11 additions: the REAL multimodal decode under the oracle
  * gate (q123 — pure-JVM PNG/BMP/WAV codecs, no stub left in the
  * pipeline), and the IVF-PQ composition (q124 — coarse partition
  * pruning + ADC scoring, the FAISS IVFADC shape). Same contract as
  * [[Pipeline]]: exact integer arithmetic only, so the DuckDB oracle
  * matches bit for bit. */
object Pipeline9 {

  type Q = (SparkSession, String) => DataFrame

  // ---- q123: encode → REAL decode parity over synthetic media ----

  /** Per-document synthetic media: pixels/samples are a pure integer
    * formula of (doc_id, index), the bytes are produced by the repo's
    * own encoders, and the decode side runs the REAL
    * [[Multimodal.BinaryDecoder]] (magic-byte sniffing, zlib inflate,
    * PNG unfiltering, BMP bottom-up rows, PCM16). The oracle
    * recomputes width/height/Σpixels straight from the formula — so a
    * hash match proves decode(encode(x)) == x for every document and
    * all four encodings, end to end through the distributed
    * mapPartitions plumbing. */
  def mediaDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      // codec cost scales with rows, not bytes: spread across cores
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        ids.map { id =>
          val m = (id % 7).toInt
          val w = (4 + id % 5).toInt
          val h = (3 + (id / 4) % 4).toInt
          def px(i: Int, c: Int, step: Int) =
            ((id * 31 + i.toLong * 7 + c.toLong * step) % 256).toInt
          m match {
            case 0 => Multimodal.MediaRow(id, "png_gray",
              Codecs.encodePng(w, h, 1,
                Array.tabulate(w * h)(i => px(i, 0, 0))), Map.empty)
            case 1 => Multimodal.MediaRow(id, "png_rgb",
              Codecs.encodePng(w, h, 3,
                Array.tabulate(w * h * 3)(j => px(j / 3, j % 3, 11))),
              Map.empty)
            case 2 => Multimodal.MediaRow(id, "bmp",
              Codecs.encodeBmp(w, h,
                Array.tabulate(w * h * 3)(j => px(j / 3, j % 3, 13))),
              Map.empty)
            case 3 =>
              val n = (16 + id % 9).toInt
              Multimodal.MediaRow(id, "wav",
                Codecs.encodeWav(Array.tabulate(n)(i =>
                  ((id * 131 + i.toLong * 17) % 65536).toInt - 32768)),
                Map.empty)
            case 4 => Multimodal.MediaRow(id, "png_gray16",
              Codecs.encodePng(w, h, 1,
                Array.tabulate(w * h)(i =>
                  ((id * 131 + i.toLong * 257) % 65536).toInt),
                bitDepth = 16, interlaced = true), Map.empty)
            case 5 => Multimodal.MediaRow(id, "png_rgb_adam7",
              Codecs.encodePng(w, h, 3,
                Array.tabulate(w * h * 3)(j => px(j / 3, j % 3, 11)),
                interlaced = true), Map.empty)
            case _ =>
              val n = (12 + id % 5).toInt
              Multimodal.MediaRow(id, "wav_stereo",
                Codecs.encodeWav(Array.tabulate(n * 2)(j =>
                  ((id * 131 + (j / 2).toLong * 17 + (j % 2) * 29)
                    % 65536).toInt - 32768),
                  channels = 2), Map.empty)
          }
        }
      }
    Multimodal.decodeStats(media, Multimodal.BinaryDecoder)
      .toDF("doc_id", "fmt", "width", "height", "n_px", "px_sum")
  }

  /** The formula recomputed in SQL — never touches bytes; only a
    * correct decoder (including Adam7 de-interlace, 16-bit samples
    * and stereo frame sums) can reproduce these from the encodings. */
  val mediaDecodeSql: String =
    """WITH p AS (SELECT doc_id, doc_id % 7 AS m,
      |    CAST(4 + doc_id % 5 AS INTEGER) AS w,
      |    CAST(3 + (doc_id // 4) % 4 AS INTEGER) AS h,
      |    CAST(16 + doc_id % 9 AS INTEGER) AS n,
      |    CAST(12 + doc_id % 5 AS INTEGER) AS n2
      |  FROM documents)
      |SELECT doc_id,
      |  CASE m WHEN 0 THEN 'png_gray' WHEN 1 THEN 'png_rgb'
      |         WHEN 2 THEN 'bmp' WHEN 3 THEN 'wav'
      |         WHEN 4 THEN 'png_gray16' WHEN 5 THEN 'png_rgb_adam7'
      |         ELSE 'wav_stereo' END AS fmt,
      |  CASE WHEN m = 3 THEN n WHEN m = 6 THEN n2 ELSE w END AS width,
      |  CASE WHEN m IN (3, 6) THEN 1 ELSE h END AS height,
      |  CASE WHEN m = 3 THEN n WHEN m = 6 THEN n2
      |       ELSE w * h END AS n_px,
      |  CAST(CASE m
      |    WHEN 0 THEN list_sum(list_transform(range(0, w*h),
      |      i -> (doc_id*31 + i*7) % 256))
      |    WHEN 1 THEN list_sum(list_transform(range(0, w*h),
      |      i -> (doc_id*31 + i*7) % 256 + (doc_id*31 + i*7 + 11) % 256
      |         + (doc_id*31 + i*7 + 22) % 256))
      |    WHEN 2 THEN list_sum(list_transform(range(0, w*h),
      |      i -> (doc_id*31 + i*7) % 256 + (doc_id*31 + i*7 + 13) % 256
      |         + (doc_id*31 + i*7 + 26) % 256))
      |    WHEN 3 THEN list_sum(list_transform(range(0, n),
      |      i -> (doc_id*131 + i*17) % 65536 - 32768))
      |    WHEN 4 THEN list_sum(list_transform(range(0, w*h),
      |      i -> (doc_id*131 + i*257) % 65536))
      |    WHEN 5 THEN list_sum(list_transform(range(0, w*h),
      |      i -> (doc_id*31 + i*7) % 256 + (doc_id*31 + i*7 + 11) % 256
      |         + (doc_id*31 + i*7 + 22) % 256))
      |    ELSE list_sum(list_transform(range(0, n2),
      |      f -> (doc_id*131 + f*17) % 65536 - 32768
      |         + (doc_id*131 + f*17 + 29) % 65536 - 32768))
      |  END AS BIGINT) AS px_sum
      |FROM p""".stripMargin

  // ---- q124: IVF-PQ (coarse pruning + ADC scoring, persisted) ----

  /** Builds the stored IVFADC index in a scratch directory and serves
    * the standard probe batch (vec_id < 8, k=5, nprobe=2, m=8) from
    * it. Scores are exact integer ADC sums, so the oracle rebuilds
    * the whole route in SQL: coarse assignment, probed cells, PQ
    * codes, lookup-table scoring — restricted to candidates whose
    * cell is probed. */
  private def cachedStore(kind: String, d: String)(
      build: String => Unit): String = StoreOnce.dir(kind, d)(build)

  private def embCorpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  def ivfPqTopK(s: SparkSession, d: String): DataFrame = {
    val e = embCorpus(s, d)
    val path = cachedStore("ivfpqidx", d)(
      graft.operators.IvfPqIndexStore.write(e, _))
    graft.operators.IvfPqIndexStore.probe(s, path,
      e.where(col("id") < 8), k = 5)
  }

  /** 1000-scaled integer quantization — DuckDB side of
    * VectorFunctions.quantize (same as Pipeline/Pipeline3). */
  private def qv(col: String) =
    s"list_transform($col, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT))"

  /** q25's coarse CTEs composed with q71's PQ CTEs; scoring joins
    * candidates to probed cells first (the partition-pruning analog),
    * then LUT-scores them. */
  val ivfPqTopKSql: String = {
    val sqd = "list_sum(list_transform(list_zip(sub.sub, cents.cv), " +
      "p -> (p[1]-p[2])*(p[1]-p[2])))"
    s"""WITH e AS (SELECT vec_id, ${qv("embedding")} AS q FROM embeddings),
       |n AS (SELECT vec_id, q,
       |  sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
       | FROM e),
       |cent AS (SELECT vec_id AS cid, q AS cv, nrm AS cn FROM n
       |  WHERE vec_id % 25 = 0 ORDER BY vec_id LIMIT 256),
       |asg AS (
       |  SELECT nid, cid FROM (
       |    SELECT n.vec_id AS nid, cent.cid,
       |      CAST(row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        CAST(list_sum(list_transform(list_zip(n.q, cent.cv), p -> p[1] * p[2])) AS DOUBLE) /
       |          (n.nrm * cent.cn) DESC, cent.cid ASC) AS INTEGER) AS arank
       |    FROM n, cent)
       |  WHERE arank = 1),
       |probes AS (
       |  SELECT qid, cid FROM (
       |    SELECT n.vec_id AS qid, cent.cid,
       |      CAST(row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        CAST(list_sum(list_transform(list_zip(n.q, cent.cv), p -> p[1] * p[2])) AS DOUBLE) /
       |          (n.nrm * cent.cn) DESC, cent.cid ASC) AS INTEGER) AS prank
       |    FROM n, cent WHERE n.vec_id < 8)
       |  WHERE prank <= 2),
       |sub AS (SELECT vec_id, CAST(t.s AS INTEGER) AS s,
       |    q[(CAST(t.s AS INTEGER)*8+1):(CAST(t.s AS INTEGER)*8+8)] AS sub
       |  FROM e, range(8) t(s)),
       |cents AS (SELECT s, cid, cv FROM (
       |    SELECT s, vec_id AS cid, sub AS cv,
       |      row_number() OVER (PARTITION BY s ORDER BY vec_id) AS crk
       |    FROM sub WHERE vec_id % 25 = 0)
       |  WHERE crk <= 256),
       |codes AS (SELECT nid, s, cid AS code FROM (
       |    SELECT sub.vec_id AS nid, sub.s, cents.cid,
       |      row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY $sqd ASC, cents.cid ASC) AS rk
       |    FROM sub JOIN cents ON sub.s = cents.s)
       |  WHERE rk = 1),
       |lut AS (SELECT sub.vec_id AS qid, cents.s, cents.cid AS code,
       |    CAST(list_sum(list_transform(list_zip(sub.sub, cents.cv),
       |      p -> p[1]*p[2])) AS BIGINT) AS pdot
       |  FROM sub JOIN cents ON sub.s = cents.s WHERE sub.vec_id < 8),
       |sc AS (SELECT probes.qid, codes.nid, CAST(SUM(pdot) AS BIGINT) AS score
       |  FROM probes
       |  JOIN asg ON asg.cid = probes.cid AND asg.nid <> probes.qid
       |  JOIN codes ON codes.nid = asg.nid
       |  JOIN lut ON lut.qid = probes.qid AND lut.s = codes.s
       |          AND lut.code = codes.code
       |  GROUP BY 1, 2)
       |SELECT qid, nid, score, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, nid ASC) AS INTEGER) AS rank FROM sc)
       |WHERE rank <= 5""".stripMargin
  }

  // ---- q125: full flex Lua config end-to-end (interpreter at bench) ----

  /** The REAL embedded Lua runtime running the reference's own
    * `flex-config/simple.lua` over the Liechtenstein extract — the
    * whole chain: distributed PBF read, location enrichment (middle
    * joins), per-partition Lua 5.4-subset interpreter states, flex
    * table writes. The oracle pins the exact per-table cardinalities,
    * which [[graft.lua.FlexLiechtensteinCppSpec]] established against
    * the reference's C++ run; registering it as a gate query ALSO
    * puts interpreter throughput on the per-round bench record
    * (round-10 verdict item 6). Fixture-driven like q112 — ignores
    * the sf dir. */
  def flexLuaE2e(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pbf = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
    val cfgPath = "/root/reference/flex-config/simple.lua"
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cfgPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val osm = graft.sources.OsmPbf.read(s, pbf)
    val enriched = graft.flex.Enrich.forFlex(osm, "create")
    val r = graft.flex.FlexRunner.run(
      new graft.flex.LuaFlexConfig(src, "simple.lua"), enriched)
    r.tables.toSeq.map { case (n, tr) => (n, tr.rows.count()) }
      .sortBy(_._1).toDF("table_name", "n_rows")
  }

  val flexLuaE2eSql: String =
    """SELECT * FROM (VALUES
      |  ('pois', CAST(1531 AS BIGINT)),
      |  ('polygons', CAST(4142 AS BIGINT)),
      |  ('restaurants', CAST(31 AS BIGINT)),
      |  ('ways', CAST(2990 AS BIGINT)))
      |t(table_name, n_rows)""".stripMargin

  // ---- q126: IVFADC + exact refine (rerank the ADC shortlist) ----

  /** The FAISS IndexRefineFlat composition over the two persisted
    * stores: the PQ store's ADC pass shortlists rerank=20 candidates
    * per query, the exact-vector IVF store rescores ONLY those with
    * the exact quantized cosine (both reads partition-pruned to the
    * shared probed cells). The oracle reruns the q124 ADC ranking to
    * rank 20 and re-scores the shortlist with q25's exact cosine. */
  def ivfPqRerank(s: SparkSession, d: String): DataFrame = {
    val e = embCorpus(s, d)
    val pqPath = cachedStore("ivfpqidx", d)(
      graft.operators.IvfPqIndexStore.write(e, _))
    val ivfPath = cachedStore("ivfidx", d)(
      graft.operators.IvfIndexStore.write(e, _))
    graft.operators.IvfPqIndexStore.probeRerank(s, pqPath, ivfPath,
      e.where(col("id") < 8), k = 5, rerank = 20)
  }

  val ivfPqRerankSql: String = {
    val adcTop20 = ivfPqTopKSql.replace(
      "WHERE rank <= 5", "WHERE rank <= 20")
    s"""WITH shortlist AS (SELECT qid, nid FROM ($adcTop20)),
       |e2 AS (SELECT vec_id, ${qv("embedding")} AS q FROM embeddings),
       |n2 AS (SELECT vec_id, q,
       |  sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
       | FROM e2),
       |ex AS (SELECT shortlist.qid, shortlist.nid,
       |    CAST(list_sum(list_transform(list_zip(nq.q, nn.q),
       |      p -> p[1] * p[2])) AS DOUBLE) / (nq.nrm * nn.nrm) AS cos
       |  FROM shortlist
       |  JOIN n2 nq ON nq.vec_id = shortlist.qid
       |  JOIN n2 nn ON nn.vec_id = shortlist.nid)
       |SELECT qid, nid, cos, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, nid ASC) AS INTEGER) AS rank FROM ex)
       |WHERE rank <= 5""".stripMargin
  }

  // ---- q129: PQ-reconstruction rerank (no flat store needed) ----

  /** The middle refinement tier: rerank the ADC shortlist by the
    * cosine against the PQ-RECONSTRUCTED vector, entirely from the PQ
    * store — ADC's dot is kept (LUT linearity makes it exactly
    * ⟨q, recon⟩) and divided by the reconstruction's norm, which is
    * the integer sum of the chosen codebook entries' squared norms.
    * No full-precision vector is read anywhere. The oracle reruns the
    * q124 ADC ranking to rank 20 and recomputes ‖recon‖² from the
    * same codes/codebook CTEs. */
  def ivfPqRerankRecon(s: SparkSession, d: String): DataFrame = {
    val e = embCorpus(s, d)
    val path = cachedStore("ivfpqidx", d)(
      graft.operators.IvfPqIndexStore.write(e, _))
    graft.operators.IvfPqIndexStore.probeRerankReconstructed(s, path,
      e.where(col("id") < 8), k = 5, rerank = 20)
  }

  val ivfPqRerankReconSql: String = {
    val adcTop20 = ivfPqTopKSql.replace(
      "WHERE rank <= 5", "WHERE rank <= 20")
    s"""WITH shortlist AS (SELECT qid, nid, score FROM ($adcTop20)),
       |e2 AS (SELECT vec_id, ${qv("embedding")} AS q FROM embeddings),
       |sub2 AS (SELECT vec_id, CAST(t.s AS INTEGER) AS s,
       |    q[(CAST(t.s AS INTEGER)*8+1):(CAST(t.s AS INTEGER)*8+8)] AS sub
       |  FROM e2, range(8) t(s)),
       |cents2 AS (SELECT s, cid, cv,
       |    CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS c2
       |  FROM (
       |    SELECT s, vec_id AS cid, sub AS cv,
       |      row_number() OVER (PARTITION BY s ORDER BY vec_id) AS crk
       |    FROM sub2 WHERE vec_id % 25 = 0)
       |  WHERE crk <= 256),
       |codes2 AS (SELECT nid, s, code FROM (
       |    SELECT sub2.vec_id AS nid, sub2.s, cents2.cid AS code,
       |      row_number() OVER (PARTITION BY sub2.vec_id, sub2.s
       |        ORDER BY list_sum(list_transform(list_zip(sub2.sub, cents2.cv),
       |          p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, cents2.cid ASC) AS rk
       |    FROM sub2 JOIN cents2 ON sub2.s = cents2.s)
       |  WHERE rk = 1),
       |rn2 AS (SELECT codes2.nid, CAST(SUM(cents2.c2) AS BIGINT) AS rn2
       |  FROM codes2 JOIN cents2 ON cents2.s = codes2.s
       |    AND cents2.cid = codes2.code
       |  GROUP BY 1),
       |qn AS (SELECT vec_id AS qid,
       |    sqrt(CAST(list_sum(list_transform(q, x -> x*x)) AS DOUBLE)) AS qn
       |  FROM e2 WHERE vec_id < 8),
       |rc AS (SELECT shortlist.qid, shortlist.nid,
       |    CAST(shortlist.score AS DOUBLE) / (qn.qn * sqrt(CAST(rn2.rn2 AS DOUBLE))) AS cos
       |  FROM shortlist
       |  JOIN rn2 ON rn2.nid = shortlist.nid
       |  JOIN qn ON qn.qid = shortlist.qid)
       |SELECT qid, nid, cos, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, nid ASC) AS INTEGER) AS rank FROM rc)
       |WHERE rank <= 5""".stripMargin
  }

  // ---- q127: baseline JPEG decode, exact flat-block oracle ----

  /** The LOSSY codec under the hash gate, on its exact subset: each
    * document becomes a grayscale JPEG of FLAT 8×8 blocks with even
    * values — the one image family where baseline JPEG round-trips
    * bit-exactly (DC-only blocks; see [[graft.sources.Jpeg]]'s
    * exactness contract). The bytes go through the repo's own encoder
    * (real Huffman entropy coding, quantization, byte stuffing) and
    * the REAL general decoder (tables from the file's own DHT/DQT,
    * canonical Huffman, IDCT), so a hash match certifies the entire
    * JPEG machinery except AC magnitudes — which JpegSpec bounds on
    * random images. */
  def jpegDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      // codec cost scales with rows, not bytes: spread across cores
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 8 * (2 + id % 3).toInt
          val h = 8 * (1 + id % 2).toInt
          val bxs = w / 8
          val px = Array.tabulate(w * h) { i =>
            val b = (i / w / 8) * bxs + (i % w) / 8
            2 * ((id * 31 + b.toLong * 7) % 128).toInt
          }
          Multimodal.MediaRow(id, "jpeg_gray",
            graft.sources.Jpeg.encodeGray(w, h, px), Map.empty)
        }
      }
    Multimodal.decodeStats(media, Multimodal.BinaryDecoder)
      .toDF("doc_id", "fmt", "width", "height", "n_px", "px_sum")
  }

  val jpegDecodeSql: String =
    """WITH p AS (SELECT doc_id,
      |    CAST(8 * (2 + doc_id % 3) AS INTEGER) AS w,
      |    CAST(8 * (1 + doc_id % 2) AS INTEGER) AS h
      |  FROM documents)
      |SELECT doc_id, 'jpeg_gray' AS fmt, w AS width, h AS height,
      |  w * h AS n_px,
      |  CAST(64 * list_sum(list_transform(range(0, (w//8) * (h//8)),
      |    b -> 2 * ((doc_id*31 + b*7) % 128))) AS BIGINT) AS px_sum
      |FROM p""".stripMargin

  // ---- q128: COLOR (YCbCr) JPEG, exact grey-axis oracle ----

  /** The color JPEG path under the hash gate, on its exact subset:
    * each document becomes an RGB image of FLAT even-valued GREY 8×8
    * blocks — the family the grey-axis exactness contract of
    * [[graft.sources.Jpeg]] covers — encoded as a REAL 3-component
    * YCbCr baseline JPEG (4:2:0 for even doc_ids, 4:4:4 for odd;
    * restart intervals of 0/1/2 MCUs by doc_id mod 3) and decoded by
    * the general decoder (interleaved MCUs, chroma upsampling,
    * YCbCr→RGB, RSTn handling). The channel-sum plane is exactly
    * 3× the grey formula, recomputed by the oracle in SQL — so a
    * hash match certifies the whole color machinery: component
    * interleave, per-component DC prediction, both quant tables,
    * subsampled-chroma round trip, restart resync, and the color
    * transform's grey axis. */
  def jpegColor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      // codec cost scales with rows, not bytes: spread across cores
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 8 * (2 + id % 4).toInt
          val h = 8 * (1 + id % 3).toInt
          val bxs = w / 8
          val rgb = new Array[Int](w * h * 3)
          var i = 0
          while (i < w * h) {
            val b = (i / w / 8) * bxs + (i % w) / 8
            val grey = 2 * ((id * 17 + b.toLong * 11) % 128).toInt
            rgb(3 * i) = grey; rgb(3 * i + 1) = grey; rgb(3 * i + 2) = grey
            i += 1
          }
          Multimodal.MediaRow(id, "jpeg_color",
            graft.sources.Jpeg.encodeColor(w, h, rgb,
              subsample = id % 2 == 0,
              restartInterval = (id % 3).toInt), Map.empty)
        }
      }
    Multimodal.decodeStats(media, Multimodal.BinaryDecoder)
      .toDF("doc_id", "fmt", "width", "height", "n_px", "px_sum")
  }

  val jpegColorSql: String =
    """WITH p AS (SELECT doc_id,
      |    CAST(8 * (2 + doc_id % 4) AS INTEGER) AS w,
      |    CAST(8 * (1 + doc_id % 3) AS INTEGER) AS h
      |  FROM documents)
      |SELECT doc_id, 'jpeg_color' AS fmt, w AS width, h AS height,
      |  w * h AS n_px,
      |  CAST(3 * 64 * list_sum(list_transform(range(0, (w//8) * (h//8)),
      |    b -> 2 * ((doc_id*17 + b*11) % 128))) AS BIGINT) AS px_sum
      |FROM p""".stripMargin

  // ---- q131: PROGRESSIVE (SOF2) JPEG, exact flat-block oracle ----

  /** The progressive JPEG path under the hash gate, on its exact
    * subset: flat even-grey 8×8 blocks survive the six-scan
    * spectral-selection × successive-approximation script exactly
    * (DC-only blocks; the split DC bits — first scan at Al=1 plus
    * one refinement bit — reassemble the full DC, and the AC scans
    * degenerate to pure EOB runs). Odd doc_ids take the grayscale
    * progressive path, even ones the color (YCbCr) path with
    * alternating 4:2:0/4:4:4 and restart intervals 0/1/2 — so one
    * hash match certifies DC first+refine, AC-first EOBn runs,
    * AC-refine correction sweeps, per-scan restart resync, and the
    * multi-scan segment loop. Non-flat coverage (ZRL, newly-nonzero
    * refinement, band splits) is JpegSpec's baseline-equality
    * property. */
  def jpegProgressive(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      // codec cost scales with rows, not bytes: spread across cores
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 8 * (2 + id % 3).toInt
          val h = 8 * (1 + id % 2).toInt
          val bxs = w / 8
          val grey = Array.tabulate(w * h) { i =>
            val b = (i / w / 8) * bxs + (i % w) / 8
            2 * ((id * 23 + b.toLong * 13) % 128).toInt
          }
          val bytes =
            if (id % 2 == 1)
              graft.sources.Jpeg.encodeGrayProgressive(w, h, grey,
                restartInterval = (id % 3).toInt)
            else {
              val rgb = grey.flatMap(v => Array(v, v, v))
              graft.sources.Jpeg.encodeColorProgressive(w, h, rgb,
                subsample = id % 4 == 0,
                restartInterval = (id % 3).toInt)
            }
          Multimodal.MediaRow(id, "jpeg_progressive", bytes, Map.empty)
        }
      }
    Multimodal.decodeStats(media, Multimodal.BinaryDecoder)
      .toDF("doc_id", "fmt", "width", "height", "n_px", "px_sum")
  }

  val jpegProgressiveSql: String =
    """WITH p AS (SELECT doc_id,
      |    CAST(8 * (2 + doc_id % 3) AS INTEGER) AS w,
      |    CAST(8 * (1 + doc_id % 2) AS INTEGER) AS h,
      |    CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 3 END AS nch
      |  FROM documents)
      |SELECT doc_id, 'jpeg_progressive' AS fmt, w AS width, h AS height,
      |  w * h AS n_px,
      |  CAST(nch * 64 * list_sum(list_transform(range(0, (w//8) * (h//8)),
      |    b -> 2 * ((doc_id*23 + b*13) % 128))) AS BIGINT) AS px_sum
      |FROM p""".stripMargin

  // ---- q132/q133: SQ8 scalar-quantization store ----

  /** The SQ8 tier end to end: train per-dimension ranges, write the
    * versioned code store, probe top-5 by the exact integer
    * reconstruction dot. The oracle retrains the same affine ranges
    * in SQL (same round-half-up integer division), so a hash match
    * certifies training, encoding, the store round trip, and the
    * scoring identity 255·⟨q,recon⟩ = 255·⟨q,min⟩ + ⟨q∘span,code⟩. */
  def sq8TopK(s: SparkSession, d: String): DataFrame = {
    val e = embCorpus(s, d)
    val path = cachedStore("sq8idx", d)(
      graft.operators.SqIndexStore.write(e, _))
    graft.operators.SqIndexStore.probe(s, path,
      e.where(col("id") < 8), k = 5)
  }

  val sq8TopKSql: String =
    s"""WITH e AS (SELECT vec_id, ${qv("embedding")} AS q FROM embeddings),
       |ex AS (SELECT vec_id, CAST(unnest(range(len(q))) AS INTEGER) AS s,
       |    unnest(q) AS x FROM e),
       |stats AS (SELECT s, min(x) AS mn, max(x) - min(x) AS span
       |  FROM ex GROUP BY 1),
       |codes AS (SELECT vec_id, ex.s,
       |    CASE WHEN span = 0 THEN 0
       |         ELSE ((x - mn) * 510 + span) // (2 * span) END AS code,
       |    mn, span
       |  FROM ex JOIN stats ON ex.s = stats.s),
       |qs AS (SELECT vec_id AS qid, s, x AS qx FROM ex WHERE vec_id < 8),
       |sc AS (SELECT qs.qid, codes.vec_id AS nid,
       |    CAST(SUM(qx * (255 * mn + code * span)) AS BIGINT) AS score
       |  FROM qs JOIN codes ON qs.s = codes.s AND codes.vec_id != qs.qid
       |  GROUP BY 1, 2)
       |SELECT qid, nid, score, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, nid ASC) AS INTEGER) AS rank FROM sc)
       |WHERE rank <= 5""".stripMargin

  /** SQ8 shortlist → exact-cosine refine (`IndexRefineFlat` over the
    * scalar-quantized base): ≤ 20 full-precision rescores per query,
    * fetched by semi-join. */
  def sq8Rerank(s: SparkSession, d: String): DataFrame = {
    val e = embCorpus(s, d)
    val path = cachedStore("sq8idx", d)(
      graft.operators.SqIndexStore.write(e, _))
    graft.operators.SqIndexStore.probeRerank(s, path, e,
      e.where(col("id") < 8), k = 5, rerank = 20)
  }

  val sq8RerankSql: String = {
    val shortlist20 = sq8TopKSql.replace("WHERE rank <= 5",
      "WHERE rank <= 20")
    s"""WITH shortlist AS (SELECT qid, nid FROM ($shortlist20)),
       |e3 AS (SELECT vec_id, ${qv("embedding")} AS q FROM embeddings),
       |n3 AS (SELECT vec_id, q,
       |    sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE))
       |      AS nrm
       |  FROM e3),
       |rc AS (SELECT shortlist.qid, shortlist.nid,
       |    CAST(list_sum(list_transform(list_zip(qn.q, nn.q),
       |      p -> p[1] * p[2])) AS DOUBLE) / (qn.nrm * nn.nrm) AS cos
       |  FROM shortlist
       |  JOIN n3 qn ON qn.vec_id = shortlist.qid
       |  JOIN n3 nn ON nn.vec_id = shortlist.nid)
       |SELECT qid, nid, cos, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, nid ASC) AS INTEGER) AS rank FROM rc)
       |WHERE rank <= 5""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q123_media_decode" -> (mediaDecode _),
    "q124_ivfpq_topk"   -> (ivfPqTopK _),
    "q125_flex_lua_e2e" -> (flexLuaE2e _),
    "q126_ivfpq_rerank" -> (ivfPqRerank _),
    "q127_jpeg_decode"  -> (jpegDecode _),
    "q128_jpeg_color"   -> (jpegColor _),
    "q129_ivfpq_recon_rerank" -> (ivfPqRerankRecon _),
    "q131_jpeg_progressive" -> (jpegProgressive _),
    "q132_sq8_topk" -> (sq8TopK _),
    "q133_sq8_rerank" -> (sq8Rerank _))

  def oracles: Map[String, String] = Map(
    "q123_media_decode" -> mediaDecodeSql,
    "q124_ivfpq_topk"   -> ivfPqTopKSql,
    "q125_flex_lua_e2e" -> flexLuaE2eSql,
    "q126_ivfpq_rerank" -> ivfPqRerankSql,
    "q127_jpeg_decode"  -> jpegDecodeSql,
    "q128_jpeg_color"   -> jpegColorSql,
    "q129_ivfpq_recon_rerank" -> ivfPqRerankReconSql,
    "q131_jpeg_progressive" -> jpegProgressiveSql,
    "q132_sq8_topk" -> sq8TopKSql,
    "q133_sq8_rerank" -> sq8RerankSql)
}
