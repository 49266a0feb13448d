package graft

import org.scalatest.funsuite.AnyFunSuite

/** CATALOG.md is the one-page operator index; this spec pins it to the
  * registry so it can never silently drift: every `SparkEntry.queries`
  * key must have a catalog row, every catalog row must name a registered
  * key, and each row's file:line must point at a real file.
  */
class CatalogSpec extends AnyFunSuite {
  private val rowRe = """\| `([a-z0-9_]+)` \| .+ \| ([^|: ]+):(\d+) \|""".r

  private lazy val catalogRows: Map[String, (String, Int)] = {
    val src = scala.io.Source.fromFile("CATALOG.md", "UTF-8")
    try src.getLines().collect {
      case rowRe(key, file, line) => key -> (file, line.toInt)
    }.toMap
    finally src.close()
  }

  test("every registered query has a catalog row") {
    val missing = SparkEntry.queries.keySet -- catalogRows.keySet
    assert(missing.isEmpty, s"add to CATALOG.md: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every catalog row names a registered query") {
    val stale = catalogRows.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"remove from CATALOG.md: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every registered query is documented in SURVEY.md") {
    val survey = {
      val s = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
      try s.mkString finally s.close()
    }
    val missing = SparkEntry.queries.keySet.filterNot(k => survey.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"registered but undocumented in SURVEY.md: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every catalog row points at an existing source file") {
    for ((key, (file, line)) <- catalogRows) {
      val f = new java.io.File(file)
      assert(f.isFile, s"$key: $file does not exist")
      val n = {
        val s = scala.io.Source.fromFile(f, "UTF-8")
        try s.getLines().size finally s.close()
      }
      assert(line <= n, s"$key: $file has $n lines, row says $line")
    }
  }
}
