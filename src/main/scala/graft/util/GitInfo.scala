package graft.util

/** Repo-state stamps for bench artifacts (r14 verdict: the committed
  * sweeps predated final HEAD by one product-source refactor, and the
  * freeze gate could not see it — key-set equality was intact). Every
  * sweep artifact records the HEAD SHA it was generated at, and the
  * freeze tier of ArtifactSyncSpec asserts that NO product source
  * (src/main) changed between that SHA and the current HEAD — making
  * "one perf-neutral refactor after regeneration" a failing test
  * instead of an accounted-for blemish.
  *
  * All lookups are best-effort Options: a missing `git` binary or a
  * non-repo working dir yields None, and only the freeze gate treats
  * that as fatal (a mid-round bench on a detached copy still runs).
  */
object GitInfo {
  private def run(cmd: String*): Option[String] =
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      if (p.waitFor() == 0) Some(out.trim) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Current HEAD SHA, if the working dir is a git repo. */
  def headSha(): Option[String] =
    run("git", "rev-parse", "HEAD").filter(_.matches("[0-9a-f]{7,40}"))

  /** HEAD SHA for ARTIFACT STAMPS: carries a `-dirty` suffix whenever
    * src/main has uncommitted changes, so a stamp always names a tree
    * that actually contains the code that produced the artifact (r18
    * verdict #4: lsh_ceiling.json was generated from a dirty
    * pre-commit tree and stamped the base SHA — its "extended_table"
    * arm exercised a geometry the stamped tree did not contain). The
    * suffix deliberately breaks the freeze gate's quote-bounded hex
    * match, so a dirty-tree artifact FAILS the gate as "carries no
    * stamp" instead of passing on the stale base SHA. */
  def stampSha(): Option[String] = headSha().map { sha =>
    val dirty = run("git", "status", "--porcelain", "--", "src/main")
      .exists(_.nonEmpty)
    if (dirty) s"$sha-dirty" else sha
  }

  /** Product sources (src/main) that differ from `since`: committed
    * changes in since..HEAD plus any uncommitted worktree changes.
    * None if git is unavailable or `since` is not a known commit. */
  def changedProductSources(since: String): Option[Seq[String]] =
    for {
      committed <- run("git", "diff", "--name-only", s"$since..HEAD", "--", "src/main")
      worktree <- run("git", "status", "--porcelain", "--", "src/main")
    } yield (committed.split('\n').map(_.trim) ++
      worktree.split('\n').map(porcelainPath)).filter(_.nonEmpty).toSeq.distinct

  /** Path from one `git status --porcelain` line: strip the "XY " status,
    * keep the NEW side of a rename ("R  old -> new"), and unquote git's
    * C-style quoting of paths with special chars (r15 advice: a rename
    * line surviving drop(3) verbatim reported a garbage pseudo-path —
    * the gate still failed, conservatively, but named the wrong file). */
  private[util] def porcelainPath(line: String): String = {
    val p0 = line.drop(3).trim
    val p1 = p0.lastIndexOf(" -> ") match {
      case -1 => p0
      case i  => p0.substring(i + 4).trim
    }
    if (p1.length >= 2 && p1.head == '"' && p1.last == '"')
      p1.substring(1, p1.length - 1)
        .replace("\\\"", "\"").replace("\\\\", "\\")
    else p1
  }
}
