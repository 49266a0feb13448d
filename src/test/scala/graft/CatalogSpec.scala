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

  test("every catalog row points at the exact registration line") {
    // Files grow every round, so file:line refs drift silently unless
    // pinned: the row's line must be the key's FIRST `"key" ->` in the
    // file (the queries-map entry; the oracleSql entry comes later).
    val lineCache = scala.collection.mutable.Map.empty[String, Map[String, Int]]
    def registrations(file: String): Map[String, Int] =
      lineCache.getOrElseUpdate(file, {
        val s = scala.io.Source.fromFile(file, "UTF-8")
        val re = """"([a-z0-9_]+)" -> """.r.unanchored
        try s.getLines().zipWithIndex.collect {
          case (re(k), i) => k -> (i + 1)
        }.toList.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
        finally s.close()
      })
    for ((key, (file, line)) <- catalogRows) {
      assert(new java.io.File(file).isFile, s"$key: $file does not exist")
      val reg = registrations(file)
      assert(reg.contains(key), s"$key: no registration found in $file")
      assert(reg(key) == line,
        s"$key: registered at $file:${reg(key)}, catalog row says $line")
    }
  }
}
