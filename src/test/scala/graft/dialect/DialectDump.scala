package graft.dialect

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.{Failure, Success, Try}

import graft.EngineContext

/**
  * Dumps everything tools/check_dialect_parity.py needs to hash-compare
  * reference E2E suite queries against DuckDB: the plain synthetic catalog
  * as parquet, each query's Spark result as parquet, and a queries.json
  * manifest. Upgrades DIALECT_COMPAT's execute-parity to result-parity for
  * every suite query both engines can run.
  *
  * `Test/runMain graft.dialect.DialectDump /tmp/dparity`
  */
object DialectDump {

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/dparity")
    val spark = EngineContext.session("local[8]", "graft-dialect-dump")
    ReferenceTables.register(spark, withNulls = false)
    val ctx = new EngineContext(spark)

    ReferenceTables.names.foreach { t =>
      Try(spark.table(t).write.mode("overwrite").parquet(s"$outDir/tables/$t")) match {
        case Success(_) => ()
        case Failure(e) => println(s"[dump] table $t not parquet-writable: ${e.getMessage}")
      }
    }

    val manifest = new StringBuilder("{\n")
    var first = true
    var dumped = 0
    var skipped = 0
    for (t <- E2eSuites.load() if !t.expectError) {
      val key = s"${t.suite}__${t.name}"
      Try {
        val df = ctx.sql(t.sql)
        df.write.mode("overwrite").parquet(s"$outDir/results/$key")
      } match {
        case Success(_) =>
          if (!first) manifest ++= ",\n"
          first = false
          manifest ++= s"""  ${jstr(key)}: ${jstr(t.sql)}"""
          dumped += 1
        case Failure(e) =>
          // e.g. interval-typed outputs parquet can't carry — the query
          // itself already passed DialectCompatSpec's execute gate
          println(s"[dump] skip $key: ${e.getMessage.linesIterator.next().take(160)}")
          skipped += 1
      }
    }
    manifest ++= "\n}\n"
    Files.createDirectories(Paths.get(outDir))
    Files.write(Paths.get(s"$outDir/queries.json"),
      manifest.result().getBytes(StandardCharsets.UTF_8))
    println(s"[dump] dumped=$dumped skipped=$skipped -> $outDir")
    spark.stop()
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""
}
