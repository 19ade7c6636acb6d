package graft.flex

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-stage flex processing (reference: src/output-flex.cpp:1542-1613
  * + SURVEY.md §2.8 step 6): stage-1 relation processing *marks* member
  * ways (`select_relation_members`), and marked ways are re-processed
  * in stage 2 where relation-derived context is available
  * (`osm2pgsql.stage == 2`); their stage-1 rows are replaced.
  *
  * The reference needs an explicit barrier + id cache + delete/reinsert
  * for this. Declaratively the barrier is free: the marked-id frame is
  * just an input to both branches, so "stage 2 sees the final marks"
  * by dataflow. The reference's hand-built id cache becomes a semi/
  * anti join pair.
  */
object TwoStage {

  /** @param ways the way stream
    * @param relations the relation stream
    * @param selectRelationMembers rels → marked way ids (one column);
    *   the analog of `select_relation_members` returning
    *   way_member_ids (src/init.lua:190-198)
    * @param processStage1 unmarked ways → rows
    * @param processStage2 marked ways → rows (the callback may join
    *   relation-derived info; it sees stage=2 semantics)
    */
  def run(ways: DataFrame, relations: DataFrame,
      selectRelationMembers: DataFrame => DataFrame,
      processStage1: DataFrame => DataFrame,
      processStage2: DataFrame => DataFrame): DataFrame = {
    val marked = selectRelationMembers(relations)
      .toDF("__mark_id").distinct()
    val unmarkedWays = ways.join(marked,
      ways("id") === col("__mark_id"), "left_anti")
    val markedWays = ways.join(marked,
      ways("id") === col("__mark_id"), "left_semi")
    processStage1(unmarkedWays).unionByName(processStage2(markedWays))
  }
}
