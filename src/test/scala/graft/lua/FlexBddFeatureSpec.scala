package graft.lua

import graft.SparkSpecBase

/** The reference's own BDD feature files, executed VERBATIM through
  * the Lua runtime (tests/bdd/flex): each scenario's grid, OSM data
  * and Lua style run end to end; table expectations check with the
  * feature matchers. Scenarios needing the append/PG flow or other
  * unsupported steps are counted as explicit skips — the summary
  * asserts a minimum pass count per feature so regressions show. */
class FlexBddFeatureSpec extends SparkSpecBase {

  private val bddDir = "/root/reference/tests/bdd/flex"

  /** feature file → minimum scenarios that must PASS (the rest may
    * skip for documented reasons; failures always fail). */
  private val features: Seq[(String, Int)] = Seq(
    "tags.feature" -> 2,
    "geometry-point.feature" -> 3,
    "geometry-linestring.feature" -> 3,
    "geometry-multipoint.feature" -> 1,
    "geometry-multilinestring.feature" -> 2,
    "geometry-null.feature" -> 1,
    "geometry-collection.feature" -> 5,
    "nogeom.feature" -> 1,
    "multigeom.feature" -> 5,
    "untagged.feature" -> 2,
    "bbox.feature" -> 7,
    "line-splitting.feature" -> 1,
    "empty-insert.feature" -> 1,
    "invalid-lua.feature" -> 1,
    "area.feature" -> 4,
    "geometry-iteration.feature" -> 1,
    "id-cache.feature" -> 2,
    "locator.feature" -> 10,
    "timestamp.feature" -> 1,
    "geometry-processing.feature" -> 3,
    "lua-table-definitions.feature" -> 8,
    "table-ids.feature" -> 1,
    "lua-basics.feature" -> 2,
    // update-flow features (the append path)
    "way-add.feature" -> 6,
    "way-change.feature" -> 9,
    "way-del.feature" -> 9,
    "way-relation-add.feature" -> 13,
    "way-relation-del.feature" -> 14,
    "node-add.feature" -> 6,
    "relation-changes.feature" -> 12,
    "delete-callbacks.feature" -> 3,
    "missing-nodes.feature" -> 1,
    "extra-attributes.feature" -> 2,
    "nocluster.feature" -> 2,
    // single-state cumulative after_* prints: the sequential
    // compatibility pass reproduces the reference stdout exactly
    "lua-callbacks.feature" -> 1,
    "lua-table-ids.feature" -> 21,
    "geometry-function-area.feature" -> 4,
    "invalid-geometries.feature" -> 4,
    "lua-index-definitions.feature" -> 26,
    "lua-expire-output-definitions.feature" -> 11,
    "lua-expire.feature" -> 14,
    "expire.feature" -> 5,
    "expire-diff.feature" -> 7,
    "expire-limit.feature" -> 3,
    "run-with-expire.feature" -> 1)

  features.foreach { case (file, minPass) =>
    test(s"bdd/flex/$file runs verbatim (≥$minPass scenarios pass)") {
      val runner = new GherkinFlexRunner(spark)
      val (bg, scenarios) = Gherkin.parse(s"$bddDir/$file")
      assert(scenarios.nonEmpty, "no scenarios parsed")
      var passed = 0
      val problems = scala.collection.mutable.ArrayBuffer.empty[String]
      val skips = scala.collection.mutable.ArrayBuffer.empty[String]
      scenarios.foreach { sc =>
        runner.runScenario(bg, sc) match {
          case runner.Passed => passed += 1
          case runner.Skipped(r) => skips += s"'${sc.name}': $r"
          case runner.Failed(r)  => problems += s"'${sc.name}': $r"
        }
      }
      info(s"$file: $passed passed, ${skips.size} skipped" +
        (if (skips.nonEmpty) s" (${skips.mkString("; ")})" else ""))
      assert(problems.isEmpty,
        s"failing scenarios:\n  ${problems.mkString("\n  ")}")
      assert(passed >= minPass,
        s"only $passed passed (want ≥$minPass); skips: $skips")
    }
  }
}
