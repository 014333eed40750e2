package graft.dialect

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** One SQL test extracted from a reference E2E suite yaml.
  * expectError = the suite marks it MESSAGE_VALIDATION (intentionally
  * invalid SQL whose point is the error message). */
final case class E2eTest(suite: String, name: String, sql: String, expectError: Boolean)

/**
  * Loader for the reference's end-to-end SQL suites
  * (reference: tests/BlazingSQLTest/EndToEndTests/TestSuites, 48 yaml
  * files, each a TEST_SUITE with TEST_xx entries carrying a `SQL: |`
  * block in the engine's dialect plus optional SPARK/DRILL comparison
  * variants and SETUP keys).
  *
  * The yaml subset used by those files is small enough to parse with a
  * line scanner (no yaml dependency is resolvable offline): block keys,
  * `|` literal blocks delimited by indentation, `#` comments. Only `SQL:`
  * blocks are taken — `SPARK:`/`DRILL:` are the comparison engines'
  * dialects, not the one under test.
  */
object E2eSuites {

  val DefaultDir = "/root/reference/tests/BlazingSQLTest/EndToEndTests/TestSuites"

  private val TestKey = """^  (TEST_\w+):\s*$""".r
  private val SqlKey = """^(\s*)SQL:\s*\|\s*$""".r

  def available: Boolean = Files.isDirectory(Paths.get(DefaultDir))

  def suiteFiles(dir: String = DefaultDir): Seq[Path] =
    Files.list(Paths.get(dir)).iterator.asScala
      .filter(_.toString.endsWith(".yaml")).toSeq.sortBy(_.getFileName.toString)

  def load(dir: String = DefaultDir): Seq[E2eTest] =
    suiteFiles(dir).flatMap(parseFile)

  def parseFile(path: Path): Seq[E2eTest] = {
    val suite = path.getFileName.toString.stripSuffix(".yaml")
    val lines = Files.readAllLines(path).asScala.toVector
    val out = Vector.newBuilder[E2eTest]

    var testName: String = ""
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val trimmed = line.trim
      if (trimmed.startsWith("#")) { i += 1 }
      else line match {
        case TestKey(name) =>
          testName = name; i += 1
        case SqlKey(indent) if testName.nonEmpty =>
          // literal block: lines more indented than the SQL: key
          val keyIndent = indent.length
          val block = Vector.newBuilder[String]
          var j = i + 1
          var done = false
          while (j < lines.length && !done) {
            val l = lines(j)
            if (l.trim.isEmpty) { block += ""; j += 1 }
            else if (l.takeWhile(_ == ' ').length > keyIndent) { block += l; j += 1 }
            else done = true
          }
          val sql = block.result().mkString("\n").trim
          // MESSAGE_VALIDATION (if any) follows inside the same TEST_ entry
          var expectError = false
          var k = j
          var scan = true
          while (k < lines.length && scan) {
            lines(k) match {
              case TestKey(_) => scan = false
              case l if l.trim.startsWith("MESSAGE_VALIDATION") => expectError = true; scan = false
              case _ => k += 1
            }
          }
          if (sql.nonEmpty) out += E2eTest(suite, testName, sql, expectError)
          testName = ""
          i = j
        case _ => i += 1
      }
    }
    out.result()
  }
}
