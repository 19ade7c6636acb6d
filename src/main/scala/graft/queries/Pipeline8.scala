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

  val queries: Map[String, Q] = Map(
    "q111_dup_spans"      -> (dupSpans _),
    "q115_dup_span_strip" -> (dupSpanStrip _))

  val oracles: Map[String, String] = Map(
    "q111_dup_spans"      -> dupSpansSql,
    "q115_dup_span_strip" -> dupSpanStripSql)
}
