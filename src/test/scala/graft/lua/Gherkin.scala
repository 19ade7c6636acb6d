package graft.lua

import scala.collection.mutable

/** Minimal Gherkin parser for the reference's BDD feature files —
  * enough structure to EXECUTE the flex scenarios verbatim through
  * the Lua runtime (tests/bdd/flex): Background, Scenario, Scenario
  * Outline with Examples substitution, docstrings and data tables.
  * Step semantics live in [[GherkinFlexRunner]]. */
object Gherkin {

  final case class Step(text: String, doc: Option[String],
      table: Vector[Vector[String]])
  final case class Scenario(name: String, steps: Vector[Step])

  /** Parse a feature file into (background steps, concrete
    * scenarios) — outlines are expanded over their Examples rows. */
  def parse(path: String): (Vector[Step], Vector[Scenario]) = {
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toVector

    var i = 0
    def peek: String = if (i < lines.size) lines(i).trim else ""
    def atEnd: Boolean = i >= lines.size

    def isHeader(l: String): Boolean =
      l.startsWith("Feature:") || l.startsWith("Scenario") ||
        l.startsWith("Background:") || l.startsWith("Examples:")
    def isStepStart(l: String): Boolean =
      Seq("Given ", "When ", "Then ", "And ", "But ").exists(l.startsWith)

    def readDoc(): Option[String] =
      if (peek == "\"\"\"") {
        // docstrings keep RAW indentation-stripped content: strip the
        // common leading whitespace of the opening fence
        val fenceIndent = lines(i).takeWhile(_ == ' ').length
        i += 1
        val buf = mutable.ArrayBuffer.empty[String]
        while (!atEnd && peek != "\"\"\"") {
          val raw = lines(i)
          buf += (if (raw.length >= fenceIndent) raw.drop(fenceIndent)
            else raw.trim)
          i += 1
        }
        i += 1 // closing fence
        Some(buf.mkString("\n"))
      } else None

    def readTable(): Vector[Vector[String]] = {
      val rows = mutable.ArrayBuffer.empty[Vector[String]]
      while (!atEnd && peek.startsWith("|")) {
        val cells = peek.stripPrefix("|").stripSuffix("|")
          .split("\\|", -1).map(_.trim).toVector
        rows += cells
        i += 1
      }
      rows.toVector
    }

    def readSteps(): Vector[Step] = {
      val steps = mutable.ArrayBuffer.empty[Step]
      var done = false
      while (!atEnd && !done) {
        val l = peek
        if (l.isEmpty || l.startsWith("#")) i += 1
        else if (isHeader(l)) done = true
        else if (isStepStart(l)) {
          i += 1
          val doc = readDoc()
          val table = if (doc.isEmpty) readTable() else Vector.empty
          steps += Step(l, doc, table)
        } else i += 1 // stray content
      }
      steps.toVector
    }

    var background = Vector.empty[Step]
    val scenarios = mutable.ArrayBuffer.empty[Scenario]
    while (!atEnd) {
      val l = peek
      if (l.startsWith("Background:")) { i += 1; background = readSteps() }
      else if (l.startsWith("Scenario Outline:") ||
          (l.startsWith("Scenario") && {
            // lookahead: outlines end in an Examples block
            lines.drop(i + 1).map(_.trim)
              .takeWhile(x => !x.startsWith("Scenario"))
              .exists(_.startsWith("Examples:"))
          })) {
        val name = l.dropWhile(_ != ':').drop(1).trim
        i += 1
        val steps = readSteps()
        // Examples block
        if (peek.startsWith("Examples:")) {
          i += 1
          // skip blanks up to the table
          while (!atEnd && peek.isEmpty) i += 1
          val tbl = readTable()
          val header = tbl.head
          tbl.drop(1).zipWithIndex.foreach { case (row, k) =>
            val subst = (s: String) => header.zip(row).foldLeft(s) {
              case (acc, (h, v)) => acc.replace(s"<$h>", v)
            }
            scenarios += Scenario(
              s"$name [${row.mkString(", ")}]".trim,
              steps.map(st => Step(subst(st.text),
                st.doc.map(subst),
                st.table.map(_.map(subst)))))
          }
        } else {
          scenarios += Scenario(name, steps)
        }
      }
      else if (l.startsWith("Scenario")) {
        val name = l.dropWhile(_ != ':').drop(1).trim
        i += 1
        scenarios += Scenario(name, readSteps())
      }
      else i += 1
    }
    (background, scenarios.toVector)
  }
}
