package graft.tools

import java.nio.file.{Files, Paths}
import scala.io.Source

/** Mechanical CATALOG.md maintenance — the fix for the r10 staleness
  * loop: CatalogSpec pins every row's `file:line` to the key's exact
  * registration line, which is the right invariant but means ANY
  * insertion above a registration staled 30 hand-written refs at once.
  * This tool regenerates the derivable parts of CATALOG.md in place:
  *
  *   - each row's `file:line` → the key's first `"key" ->` line in the
  *     named file (the same rule CatalogSpec asserts);
  *   - each `## section (N)` header count → the number of rows that
  *     follow it before the next header;
  *   - the `**Total: N operators …**` footer count → total row count.
  *
  * Row text (key, description, file) stays hand-written — only line
  * numbers and counts are regenerated. Run `sbt "runMain
  * graft.tools.CatalogRepin"` after any edit that shifts registration
  * lines; CatalogSpec stays the enforcement, this is the repair.
  * Exits nonzero if a row names a key with no registration, so a typo
  * can't be silently "repinned".
  */
object CatalogRepin {
  private val rowRe = """(\| `([a-z0-9_]+)` \| .+ \| )([^|: ]+):(\d+)( \|)""".r
  private val headerRe = """(## .+ )\((\d+)\)""".r
  private val totalRe = """(\*\*Total: )(\d+)( operators.*)""".r

  def main(args: Array[String]): Unit = {
    val path = Paths.get(if (args.nonEmpty) args(0) else "CATALOG.md")
    val lines = {
      val s = Source.fromFile(path.toFile, "UTF-8")
      try s.getLines().toVector finally s.close()
    }
    val regCache = scala.collection.mutable.Map.empty[String, Map[String, Int]]
    def registrations(file: String): Map[String, Int] =
      regCache.getOrElseUpdate(file, {
        val s = Source.fromFile(file, "UTF-8")
        val re = """"([a-z0-9_]+)" -> """.r.unanchored
        try s.getLines().zipWithIndex.collect {
          case (re(k), i) => k -> (i + 1)
        }.toList.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
        finally s.close()
      })

    var missing = List.empty[String]
    val repinned = lines.map {
      case rowRe(prefix, key, file, _, suffix) =>
        registrations(file).get(key) match {
          case Some(n) => s"$prefix$file:$n$suffix"
          case None => missing ::= s"$key (no registration in $file)"; ""
        }
      case other => other
    }
    if (missing.nonEmpty) {
      System.err.println(s"[repin] FAILED: ${missing.mkString("; ")}")
      sys.exit(1)
    }

    // Second pass: section counts + total, from the repinned row layout.
    val isRow = (l: String) => rowRe.matches(l)
    val total = repinned.count(isRow)
    val out = repinned.zipWithIndex.map {
      case (headerRe(prefix, _), i) =>
        val tail = repinned.drop(i + 1).takeWhile(l => !l.startsWith("## "))
        s"$prefix(${tail.count(isRow)})"
      case (totalRe(prefix, _, suffix), _) => s"$prefix$total$suffix"
      case (l, _) => l
    }
    Files.writeString(path, out.mkString("", "\n", "\n"))
    println(s"[repin] $total rows, refs + counts regenerated in $path")
  }
}
