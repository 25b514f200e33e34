package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Source-hygiene gates: scale anti-patterns that pass every functional
  * test locally (where the literal happens to equal the configured
  * parallelism) and only bite on a real cluster. Grep-style, so a
  * regression anywhere in `src/main` fails CI, not just the file the
  * original fix touched.
  */
class HygieneSpec extends AnyFunSuite {

  private def mainSources: Seq[Path] =
    Files.walk(Paths.get("src/main/scala")).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq

  private def offending(re: scala.util.matching.Regex): Seq[String] =
    mainSources.flatMap { p =>
      val text = new String(Files.readAllBytes(p), "UTF-8")
      text.linesIterator.zipWithIndex.collect {
        case (line, i)
            if re.findFirstIn(line).isDefined &&
              !line.trim.startsWith("//") && !line.trim.startsWith("*") =>
          s"$p:${i + 1}: ${line.trim}"
      }
    }

  test("no integer-literal repartition in src/main") {
    // .repartition(32) coalesces a 100 TB stage to 32 tasks — parallelism
    // must follow config/input splits (repartition by column, or Barrier
    // for a materialization cut). coalesce(1) for tiny bounded results is
    // allowed; repartition with a leading column arg is allowed. A
    // leading INT literal is flagged even with trailing column args —
    // repartition(32, col("x")) still pins the stage width.
    val hits = offending("""\.repartition\(\s*\d+\s*[,)]""".r)
    assert(hits.isEmpty,
      "fixed-width repartition (a scale-killer at 100 TB):\n" +
        hits.mkString("\n"))
  }

  test("no Scala UDFs in src/main") {
    // udf() breaks whole-stage codegen and ships closures; the library's
    // extension point is native Catalyst Expressions (functions/*).
    val hits = offending("""(^|[^\w.])udf\(""".r)
    assert(hits.isEmpty, "udf() found:\n" + hits.mkString("\n"))
  }

  test("no collect() outside contract-bounded sites") {
    // Every collect in src/main must carry the BOUNDED comment tag naming
    // its bound (k centroids, codebooks, 1-row stats...). New collects
    // must justify themselves the same way.
    val hits = mainSources.flatMap { p =>
      val lines = new String(Files.readAllBytes(p), "UTF-8")
        .linesIterator.toVector
      lines.zipWithIndex.collect {
        case (line, i)
            if line.contains(".collect()") &&
              !line.trim.startsWith("//") &&
              // the justification tag sits on the line or within the two
              // lines above (multi-line call chains)
              !(line.contains("BOUNDED") ||
                (i > 0 && lines(i - 1).contains("BOUNDED")) ||
                (i > 1 && lines(i - 2).contains("BOUNDED"))) =>
          s"$p:${i + 1}: ${line.trim}"
      }
    }
    assert(hits.isEmpty,
      "collect() without a BOUNDED justification tag:\n" +
        hits.mkString("\n"))
  }
}
