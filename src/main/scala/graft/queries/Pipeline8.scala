package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Round-9 additions: the corpus-scale exact-substring dedup family —
  * global duplicated-run reconstruction and removal (Lee et al. 2022
  * semantics), deliberately NOT conditioned on LSH candidate pairs.
  * Same contract as [[Pipeline]]: exact integer/string arithmetic
  * only, so the DuckDB oracle matches bit for bit. */
object Pipeline8 {

  type Q = (SparkSession, String) => DataFrame

  private val W = raw"regexp_split_to_array(trim(lower(text)), '\s+')"

  // ---- q111: global duplicated-span reconstruction ----

  def dupSpans(s: SparkSession, d: String): DataFrame =
    Dedup.dupSpans(Tables.documents(s, d), "doc_id", "text")

  /** Shared CTE prefix: positioned 5-grams, corpus-duplicated grams,
    * gaps-and-islands run reconstruction, spans ≥ 10 tokens. */
  private val spansCte: String =
    s"""WITH toks AS (SELECT doc_id, $W AS w FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    unnest(range(1, greatest(len(w)-3, 1))) AS i,
       |    unnest(list_transform(range(1, greatest(len(w)-3, 1)),
       |      i -> array_to_string(w[i:i+4], ' '))) AS g
       |  FROM toks),
       |dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
       |st AS (SELECT doc_id, i FROM grams JOIN dupg USING (g)),
       |isl AS (SELECT doc_id, i,
       |  i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |  FROM st),
       |spans AS (
       |  SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
       |    CAST(count(*) + 4 AS BIGINT) AS span_len
       |  FROM isl GROUP BY doc_id, grp
       |  HAVING count(*) + 4 >= 10)""".stripMargin

  val dupSpansSql: String =
    s"""$spansCte
       |SELECT s.doc_id, s.span_start, s.span_len,
       |  md5(array_to_string(
       |    w[s.span_start:s.span_start + s.span_len - 1], ' ')) AS span_fp
       |FROM spans s JOIN toks USING (doc_id)""".stripMargin

  // ---- q115: duplicated-span removal report ----

  def dupSpanStrip(s: SparkSession, d: String): DataFrame =
    Dedup.stripDupSpans(Tables.documents(s, d), "doc_id", "text")

  val dupSpanStripSql: String =
    s"""$spansCte,
       |cov AS (SELECT DISTINCT doc_id, pos FROM (
       |  SELECT doc_id,
       |    unnest(range(span_start, span_start + span_len)) AS pos
       |  FROM spans)),
       |tok AS (SELECT doc_id,
       |    unnest(range(1, len(w) + 1)) AS pos, unnest(w) AS t
       |  FROM toks),
       |kept AS (
       |  SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    array_to_string(list(t ORDER BY pos), ' ') AS cleaned
       |  FROM tok LEFT JOIN cov USING (doc_id, pos)
       |  WHERE cov.pos IS NULL GROUP BY tok.doc_id)
       |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
       |  CAST(len(t.w) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       |  md5(COALESCE(k.cleaned, '')) AS cleaned_fp
       |FROM toks t LEFT JOIN kept k USING (doc_id)""".stripMargin

  // ---- q116: sampled BPE training + one-pass corpus-wide apply ----

  def bpeSampled(s: SparkSession, d: String): DataFrame =
    graft.operators.TextAnalysis.bpeSampledCompression(
      Tables.documents(s, d), "doc_id", "text", rounds = 4)

  /** The oracle unrolls the sampled trainer: pair counts come from
    * the md5-sampled chain s_r ONLY, while the fuse applies to the
    * full-corpus chain d_r — the same train-on-sample /
    * apply-corpus-wide split the engine runs (whose apply is the
    * one-pass BpeApplyExpr kernel; fuse semantics are the identical
    * literal replace, so the round-by-round oracle replay matches the
    * kernel bit for bit). m_r is LEFT-joined: a degenerate sample
    * stops learning without dropping documents. */
  private def bpeSampledCte(rounds: Int): String = {
    def fuse(prev: String, out: String, r: Int) =
      s"""$out AS (SELECT doc_id, CASE WHEN len(w) = 0 THEN w
         |    ELSE string_split(substr(s, 2, length(s) - 2), '][') END AS w
         |  FROM (SELECT doc_id, w,
         |    CASE WHEN m$r.pair IS NULL
         |      THEN '[' || array_to_string(w, '][') || ']'
         |      ELSE replace('[' || array_to_string(w, '][') || ']',
         |        '[' || split_part(m$r.pair, ' ', 1) || '][' ||
         |          split_part(m$r.pair, ' ', 2) || ']',
         |        '[' || replace(m$r.pair, ' ', '+') || ']') END AS s
         |    FROM $prev LEFT JOIN m$r ON TRUE))""".stripMargin
    val sb = new StringBuilder(
      s"""WITH d0 AS (SELECT doc_id, $W AS w FROM documents),
         |s0 AS (SELECT doc_id, w FROM d0
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'),
         |""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(
        s"""p$r AS (SELECT w[i] || ' ' || w[i+1] AS pair, count(*) AS cnt
           |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM s${r - 1})
           |  GROUP BY 1),
           |m$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair ASC LIMIT 1),
           |""".stripMargin)
      sb.append(fuse(s"s${r - 1}", s"s$r", r)).append(",\n")
      sb.append(fuse(s"d${r - 1}", s"d$r", r)).append(",\n")
    }
    sb.setLength(sb.length - 2)
    sb.toString
  }

  val bpeSampledSql: String =
    bpeSampledCte(4) +
      """
        |SELECT d0.doc_id,
        |  CAST(len(d0.w) AS BIGINT) AS n_before,
        |  CAST(len(d4.w) AS BIGINT) AS n_after
        |FROM d0 JOIN d4 USING (doc_id)""".stripMargin

  val queries: Map[String, Q] = Map(
    "q111_dup_spans"      -> (dupSpans _),
    "q115_dup_span_strip" -> (dupSpanStrip _),
    "q116_bpe_sampled"    -> (bpeSampled _))

  val oracles: Map[String, String] = Map(
    "q111_dup_spans"      -> dupSpansSql,
    "q115_dup_span_strip" -> dupSpanStripSql,
    "q116_bpe_sampled"    -> bpeSampledSql)
}
