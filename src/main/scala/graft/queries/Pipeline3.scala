package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Sampling, Similarity, Skew, TextAnalysis}
import graft.queries.Exact._

/** Round-4 additions: semantic dedup (SemDeDup shape), skew-salted
  * join, per-group top-n selection, deterministic source mixing, and
  * integer tf-idf term relevance. Same contract as [[Pipeline]]: every
  * query has a DuckDB oracle computing identical deterministic
  * arithmetic.
  */
object Pipeline3 {

  type Q = (SparkSession, String) => DataFrame

  /** tokens of lower(text) — DuckDB side of TextFunctions.normToks */
  private val W = raw"regexp_split_to_array(trim(lower(text)), '\s+')"

  /** 1000-scaled integer quantization — DuckDB side of
    * VectorFunctions.quantize */
  private def qv(col: String) =
    s"list_transform($col, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT))"

  private val qdotSql =
    (a: String, b: String) =>
      s"CAST(list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) AS DOUBLE)"

  // ---- q66: semantic dedup (cluster, then near-dup within cell) ----

  def semanticDedup(s: SparkSession, d: String): DataFrame =
    Dedup.semanticDedup(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", threshold = 0.95, centroidEvery = 25)
      .select(col("id").as("vec_id"), col("cell"), col("kept"))

  val semanticDedupSql: String =
    s"""WITH e AS (SELECT vec_id, ${qv("embedding")} AS q FROM embeddings),
       |n AS (SELECT vec_id, q,
       |  sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
       | FROM e),
       |cent AS (SELECT vec_id AS cid, q AS cv, nrm AS cn FROM n
       |  WHERE vec_id % 25 = 0),
       |asg AS (
       |  SELECT nid, q, nrm, cid AS cell FROM (
       |    SELECT n.vec_id AS nid, n.q, n.nrm, cent.cid,
       |      CAST(row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        ${qdotSql("n.q", "cent.cv")} / (n.nrm * cent.cn) DESC,
       |        cent.cid ASC) AS INTEGER) AS arank
       |    FROM n, cent)
       |  WHERE arank = 1),
       |dropped AS (
       |  SELECT DISTINCT b.nid AS id
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.nid < b.nid
       |  WHERE ${qdotSql("a.q", "b.q")} / (a.nrm * b.nrm) >= 0.95)
       |SELECT asg.nid AS vec_id, asg.cell,
       |  (dropped.id IS NULL) AS kept
       |FROM asg LEFT JOIN dropped ON asg.nid = dropped.id""".stripMargin

  // ---- q67: skew-salted join ----

  def saltedSkewJoin(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_extendedprice"),
        col("l_quantity"))
    val dim = Tables.part(s, d)
      .select(col("p_partkey").as("pk"), col("p_brand"))
    Skew.saltedJoin(fact, dim, Seq("pk"), salts = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
  }

  val saltedSkewJoinSql: String =
    s"""SELECT p_brand, count(*) AS n_items,
       |  ${dsumSql("l_extendedprice")} AS revenue,
       |  ${dsumSql("l_quantity")} AS qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand""".stripMargin

  // ---- q68: per-group top-n selection ----

  def topNPerGroup(s: SparkSession, d: String): DataFrame =
    Sampling.topNPerGroup(
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        col("n_chars")),
      "lang", "n_chars", "doc_id", n = 3)

  val topNPerGroupSql: String =
    """SELECT doc_id, lang, n_chars, rk FROM (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY n_chars DESC, doc_id ASC) AS INTEGER) AS rk
      |  FROM documents)
      |WHERE rk <= 3""".stripMargin

  // ---- q69: deterministic source mixing ----

  def sourceMix(s: SparkSession, d: String): DataFrame =
    Sampling.sourceMix(
      Tables.documents(s, d).select(col("doc_id"), col("source")),
      "source", "doc_id",
      quota = Map("src0" -> 15, "src1" -> 10, "src2" -> 8),
      defaultQuota = 5)

  val sourceMixSql: String =
    """SELECT doc_id, source, rk FROM (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER)
      |      AS rk
      |  FROM documents)
      |WHERE rk <= CASE source WHEN 'src0' THEN 15 WHEN 'src1' THEN 10
      |  WHEN 'src2' THEN 8 ELSE 5 END""".stripMargin

  // ---- q70: integer tf-idf term relevance ----

  private val Terms = Seq("the", "data", "of")

  def termRelevance(s: SparkSession, d: String): DataFrame =
    TextAnalysis.termRelevance(Tables.documents(s, d), "doc_id", "text",
      Terms, topN = 20)

  val termRelevanceSql: String = {
    val tf = Terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(w, x -> x = '$t')) AS tf$i"
    }.mkString(", ")
    val df = Terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val score = Terms.indices.map(i =>
      s"tf$i * ((n * 1000000) // (df$i + 1))").mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, $W AS w FROM documents),
       |tfs AS (SELECT doc_id, $tf FROM toks),
       |stats AS (SELECT count(*) AS n, $df FROM tfs)
       |SELECT doc_id, CAST($score AS BIGINT) AS score
       |FROM tfs, stats
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  // ---- q71: product-quantization ANN (ADC scoring) ----

  def pqAnnTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.pqTopK(e.where(col("id") < 8), e, k = 5)
  }

  /** codebooks = subvectors of vec_id % 25 == 0; m = 8 subspaces of 8
    * dims; integer L2 encode, integer-dot ADC scores. */
  val pqAnnTopKSql: String = {
    val sqd = "list_sum(list_transform(list_zip(sub.sub, cents.cv), " +
      "p -> (p[1]-p[2])*(p[1]-p[2])))"
    s"""WITH e AS (SELECT vec_id, ${qv("embedding")} AS q FROM embeddings),
       |sub AS (SELECT vec_id, CAST(t.s AS INTEGER) AS s,
       |    q[(CAST(t.s AS INTEGER)*8+1):(CAST(t.s AS INTEGER)*8+8)] AS sub
       |  FROM e, range(8) t(s)),
       |cents AS (SELECT s, vec_id AS cid, sub AS cv FROM sub
       |  WHERE vec_id % 25 = 0),
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
       |sc AS (SELECT lut.qid, codes.nid, CAST(SUM(pdot) AS BIGINT) AS score
       |  FROM codes JOIN lut ON codes.s = lut.s AND codes.code = lut.code
       |  WHERE lut.qid <> codes.nid GROUP BY 1, 2)
       |SELECT qid, nid, score, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, nid ASC) AS INTEGER) AS rank FROM sc)
       |WHERE rank <= 5""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q71_pq_ann_topk"      -> (pqAnnTopK _),
    "q66_semantic_dedup"   -> (semanticDedup _),
    "q67_salted_skew_join" -> (saltedSkewJoin _),
    "q68_topn_per_group"   -> (topNPerGroup _),
    "q69_source_mix"       -> (sourceMix _),
    "q70_term_relevance"   -> (termRelevance _))

  val oracles: Map[String, String] = Map(
    "q71_pq_ann_topk"      -> pqAnnTopKSql,
    "q66_semantic_dedup"   -> semanticDedupSql,
    "q67_salted_skew_join" -> saltedSkewJoinSql,
    "q68_topn_per_group"   -> topNPerGroupSql,
    "q69_source_mix"       -> sourceMixSql,
    "q70_term_relevance"   -> termRelevanceSql)
}
